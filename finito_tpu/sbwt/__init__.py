from finito_tpu.sbwt.sbwt import PlainMatrixSBWT
from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
from finito_tpu.sbwt.lcs import lcs_array
