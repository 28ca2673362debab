from finito_tpu.ops.bitvec import DeviceSBWT, rank, update_interval, kmer_ranks_fixed
