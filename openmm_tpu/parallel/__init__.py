"""Multi-chip parallelism: shard_map force decomposition over a device mesh.

TPU-native counterpart of the reference's multi-GPU scheme
(platforms/cuda/src/CudaParallelKernels.cpp:66-248: positions broadcast to
every device, the nonbonded tile range sharded, forces peer-copied and
summed). Here: positions are replicated, the upper-triangle block-pair list
of the pairwise sweep is sharded over the mesh's 'dp' axis, and energies are
psum'd — jax.grad through the psum yields correctly reduced forces with no
explicit communication code. Static shard sizes replace the reference's
dynamic rebalancing (XLA requires static shapes; uniform tiles balance by
construction).
"""
from .mesh import (get_default_mesh, set_default_mesh, make_mesh,
                   sharded_pair_energy)

__all__ = ["get_default_mesh", "set_default_mesh", "make_mesh",
           "sharded_pair_energy"]
