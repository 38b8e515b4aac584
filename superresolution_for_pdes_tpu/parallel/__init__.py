"""Device-mesh parallelism: sharded training, fused on-device datagen.

The reference has no distributed anything (SURVEY.md section 2: no
torch.distributed, no NCCL/Gloo/MPI; DataLoader workers only). The TPU-native
scale-out story is GSPMD: a ``jax.sharding.Mesh`` with a ``data`` axis, batch
axes sharded via ``NamedSharding``/``with_sharding_constraint``, and XLA
inserting the gradient all-reduces and cross-chip BatchNorm reductions over
ICI automatically. Multi-host extends the same program via
``jax.distributed.initialize`` — no custom transport layer.
"""

from superresolution_for_pdes_tpu.parallel.mesh import data_mesh, device_count, grid_mesh  # noqa: F401
from superresolution_for_pdes_tpu.parallel.multihost import initialize_multihost  # noqa: F401
from superresolution_for_pdes_tpu.parallel.online import make_online_train_step  # noqa: F401
