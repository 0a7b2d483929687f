from .morphology import (extract_features, get_size, get_intensity_profile,
                         get_angle_apr, get_aspect_ratio_no_rotation)
