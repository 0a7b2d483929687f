from .vq import vq_lookup, vq_codebook_counts
