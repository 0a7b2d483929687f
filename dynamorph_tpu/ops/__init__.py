from .vq import vq_lookup, vq_codebook_counts
from .patch import extract_cell_patches, median_background, labels_to_map, disk_filter
