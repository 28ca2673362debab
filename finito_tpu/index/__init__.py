from finito_tpu.index.packed_strings import PackedStrings, permute_unitigs
from finito_tpu.index.builder import FinimizerIndexBuilder
from finito_tpu.index.index import FinimizerIndex, QueryResult
