from .block import (
    MtxDataBlock,
    MtxMemoryBlock,
    find_consecutive_blocks,
    create_ones_like,
)
from .pipeline import PrefetchLoader, sequential_batches
from .annotation import Annotation
