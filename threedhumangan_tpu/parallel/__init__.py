"""Parallelism: device meshes, sharded train steps, cross-replica stats.

Replaces the reference's NCCL stack (SURVEY.md §2.8): DDP grad allreduce ->
psum over an ICI mesh axis inside shard_map; SyncBatchNorm -> pmean'd batch
moments; training_stats all_reduce -> one psum of stacked moment vectors.
"""

from threedhumangan_tpu.parallel.mesh import create_mesh, local_device_count
from threedhumangan_tpu.parallel.stats import Collector, moments, psum_moments
