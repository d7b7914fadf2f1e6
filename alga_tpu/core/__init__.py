from alga_tpu.core.seqbatch import SeqBatch  # noqa: F401
from alga_tpu.core import packing  # noqa: F401
