from .mesh import make_tile_mesh
from .tiles import (scan_pass_a_sharded, scan_pass_b_sharded, shard_band,
                    HALO_AXIS)
