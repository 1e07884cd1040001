"""humid_tpu — TPU-native reference-free FastQ deduplication.

A from-scratch rebuild of the capabilities of jfjlaros/HUMID
(/root/reference) designed for TPU hardware: 2-bit packed integer
fingerprints, batched XOR+popcount / one-hot-MXU distance kernels,
iterative label-propagation clustering, and data-parallel sharding over
device meshes.  See SURVEY.md for the behavioural contract.
"""

from .pipeline import run, PipelineResult

__version__ = "0.1.0"

__all__ = ["run", "PipelineResult", "__version__"]
