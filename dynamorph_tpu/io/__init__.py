from .pickles import load_pickle, save_pickle
from .sites import get_im_sites, group_sites_by_well
from .images import read_image, im_adjust, im_bit_convert
