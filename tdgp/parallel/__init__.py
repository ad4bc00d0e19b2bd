from tdgp.parallel.mesh import make_mesh, shard_batch, replicate
from tdgp.parallel.consistency import check_replica_consistency
