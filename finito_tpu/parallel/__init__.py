from finito_tpu.parallel.mesh import ShardedIndex, make_mesh, sharded_locate_fn
