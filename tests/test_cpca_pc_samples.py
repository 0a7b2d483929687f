"""Contrastive PCA and PC-sample montages."""
import os

import numpy as np

from dynamorph_tpu.analysis.pc_samples import (pc_sample_montage,
                                               quantile_buckets)
from dynamorph_tpu.reduce.cpca import auto_alphas, fit_cpca


def test_cpca_finds_contrastive_direction(rng):
    """Target varies along dim 0 (shared with background) and dim 1 (target-
    only); cPCA with alpha>0 must pick dim 1 while plain PCA picks dim 0."""
    n, d = 2000, 8
    background = rng.randn(n, d) * 0.1
    background[:, 0] += rng.randn(n) * 5.0   # big shared variance on dim 0
    target = rng.randn(n, d) * 0.1
    target[:, 0] += rng.randn(n) * 5.0
    target[:, 1] += rng.randn(n) * 1.5       # target-specific dim 1

    results = fit_cpca(target, background, n_components=1,
                       alphas=(0.0, 10.0))
    (a0, comp0, _), (a1, comp1, _) = results
    assert np.argmax(np.abs(comp0[0])) == 0     # alpha=0 == PCA -> dim 0
    assert np.argmax(np.abs(comp1[0])) == 1     # contrastive -> dim 1


def test_auto_alphas():
    a = auto_alphas()
    assert a[0] == 0.0 and len(a) == 4 and np.all(np.diff(a) > 0)


def test_quantile_buckets_partition(rng):
    v = rng.randn(100)
    buckets = quantile_buckets(v, 5)
    all_idx = np.concatenate(buckets)
    assert len(all_idx) == 100
    assert len(set(all_idx.tolist())) == 100


def test_pc_sample_montage_outputs(tmp_path, rng):
    patches = rng.rand(50, 2, 32, 32).astype(np.float32)
    pcs = rng.randn(50)
    pc_sample_montage(patches, pcs, str(tmp_path), pc_name="PC1",
                      n_buckets=3, n_samples=4)
    files = sorted(os.listdir(tmp_path))
    assert "PC1_bucket0_aver.png" in files
    assert "PC1_bucket2_samples.png" in files
