from .pca import PCAModel, fit_pca, process_pca
