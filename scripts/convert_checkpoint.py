"""
One-time torch -> native checkpoint conversion.

Usage:
    python scripts/convert_checkpoint.py /path/to/diffusers-checkpoint /path/to/output

Converts a diffusers-layout torch checkpoint (e.g. a local download of
riffusion/riffusion-model-v1) to the framework's native msgpack format for
fast loads (reference equivalence: the one-time trace the reference
downloaded as unet_traced.pt; riffusion_pipeline.py:127-171).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]

    from riffusion_tpu.models.weights import load_diffusers_checkpoint, save_native

    print(f"converting {src} ...")
    bundle = load_diffusers_checkpoint(src)
    save_native(bundle, dst)

    # carry tokenizer files over so the native checkpoint is self-contained
    import shutil

    tok_dir = Path(src) / "tokenizer"
    if tok_dir.is_dir():
        for name in ("vocab.json", "merges.txt"):
            if (tok_dir / name).exists():
                shutil.copy(tok_dir / name, Path(dst) / name)
    print(f"wrote native checkpoint to {dst}")


if __name__ == "__main__":
    main()
