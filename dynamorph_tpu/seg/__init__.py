from .model import Segment, SegmentWithMultipleSlice
from .data import (load_input, load_label, generate_patches,
                   generate_ordered_patches, preprocess)
from .inference import predict_whole_map
