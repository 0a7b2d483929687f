"""Export a TPU-trained VQ-VAE checkpoint to a reference-format torch
``model.pt`` so the original PyTorch pipeline can consume it.

Usage:
    python -m dynamorph_tpu.cli.export_torch \
        --checkpoint <orbax dir> --network VQ_VAE_z16 --out model.pt
"""
from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True,
                        help="orbax checkpoint dir ({params, state})")
    parser.add_argument("--network", default="VQ_VAE_z16",
                        choices=["VQ_VAE_z16", "VQ_VAE_z32"])
    parser.add_argument("--out", required=True, help="output model.pt path")
    args = parser.parse_args()

    from ..models.torch_export import (export_vqvae_z16, export_vqvae_z32,
                                       save_torch_checkpoint)
    from ..train.checkpoint import restore_checkpoint

    ck = restore_checkpoint(args.checkpoint)
    export = export_vqvae_z16 if args.network == "VQ_VAE_z16" \
        else export_vqvae_z32
    sd = export(ck["params"], ck["state"])
    save_torch_checkpoint(sd, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
