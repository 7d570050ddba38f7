"""Standalone CLIP R-Precision over a set of rendered avatars.

The paper's quantitative protocol (reference ships the tool unwired,
utils/r_precision.py:7-69): N avatars rendered from their runs, N prompts;
embed both with CLIP and count top-1 (and top-5) retrieval accuracy of each
render's own prompt among all N.

Usage:
    python scripts/eval_r_precision.py --renders DIR --prompts FILE \
        [--weights DIR] [--tiny]

``--renders``: directory of images; each file's stem must match a line
index or slug in the prompt file (two accepted layouts: `000.png` =
prompt line 0, or `<slug>.png` where slug is the prompt's exp-name slug).
``--prompts``: text file, one prompt per line.
``--weights``: converted CLIP towers dir (clip_vision.msgpack +
clip_retrieval_text.msgpack + vocab.json/merges.txt). ``--tiny`` runs the
random tiny towers instead — pipeline smoke only, NOT a meaningful score.
"""
import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def slugify(text: str) -> str:
    """Prompt -> exp-name slug (matches main.py's @-substitution)."""
    return re.sub(r"[^a-z0-9]+", "_", text.lower()).strip("_")


def load_images(renders_dir: Path, prompts):
    import numpy as np
    from PIL import Image

    files = sorted(p for p in renders_dir.iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    by_stem = {p.stem: p for p in files}
    images, kept = [], []
    for i, prompt in enumerate(prompts):
        cand = by_stem.get(f"{i:03d}") or by_stem.get(str(i)) \
            or by_stem.get(slugify(prompt))
        if cand is None:
            continue
        img = np.asarray(Image.open(cand).convert("RGB"), np.float32) / 255.0
        images.append(img)
        kept.append(i)
    return images, kept


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--renders", required=True)
    ap.add_argument("--prompts", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny towers (pipeline smoke only)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    prompts = [ln.strip() for ln in Path(args.prompts).read_text().splitlines()
               if ln.strip()]
    images, kept = load_images(Path(args.renders), prompts)
    if not images:
        raise SystemExit("no renders matched the prompt list")
    texts = [prompts[i] for i in kept]

    if args.tiny:
        from dreamwaltz_g_tpu.utils.r_precision import make_tiny_r_precision

        rp = make_tiny_r_precision(jax.random.PRNGKey(0))
        ids = np.asarray(
            np.random.RandomState(0).randint(1, 200, size=(len(texts), 16)),
            np.int32)
        feats_t = rp.text_features(ids)
    else:
        from dreamwaltz_g_tpu.guidance.clip_text import (CLIPTextConfig,
                                                         CLIPTokenizer)
        from dreamwaltz_g_tpu.guidance.convert import load_params
        from dreamwaltz_g_tpu.utils.r_precision import (CLIPTextTower,
                                                        CLIPVisionModel,
                                                        RPrecision)

        wd = Path(args.weights or "")
        vision = CLIPVisionModel()
        text = CLIPTextTower(CLIPTextConfig())
        vparams = load_params(str(wd / "clip_vision.msgpack"), vision.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))))
        tparams = load_params(
            str(wd / "clip_retrieval_text.msgpack"),
            text.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)))
        tok = CLIPTokenizer(str(wd / "vocab.json"), str(wd / "merges.txt"))
        rp = RPrecision(vision, text, vparams, tparams, tokenizer=tok)
        feats_t = rp.text_features(texts)

    # resize every render to a common square before stacking
    import numpy as np

    size = max(im.shape[0] for im in images)
    stack = np.stack([
        np.asarray(jax.image.resize(jnp.asarray(im), (size, size, 3),
                                    "bilinear")) for im in images])
    feats_i = rp.image_features(stack)
    sims = np.asarray(feats_i @ feats_t.T)          # (N, N)
    order = np.argsort(-sims, axis=1)
    n = sims.shape[0]
    top1 = float(np.mean(order[:, 0] == np.arange(n)))
    top5 = float(np.mean([
        i in order[i, : min(5, n)] for i in range(n)]))
    print(json.dumps({"metric": "clip_r_precision", "n": n,
                      "top1": top1, "top5": top5,
                      "tiny_towers": bool(args.tiny)}))


if __name__ == "__main__":
    main()
