from .context import active_mesh, replicate, shard_last, use_mesh
from .mesh import (fold_lsb_sharded, fold_msb_sharded, make_mesh,
                   merkle_root_sharded, ntt_sharded, spartan_round_sharded,
                   whir_round_sharded)

__all__ = ["make_mesh", "spartan_round_sharded", "fold_msb_sharded",
           "whir_round_sharded", "fold_lsb_sharded", "ntt_sharded",
           "merkle_root_sharded", "use_mesh", "active_mesh", "shard_last",
           "replicate"]
