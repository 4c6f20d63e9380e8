"""Verify the benchmark scenes on disk against docs/SCENE_MANIFEST.json.

The 49-view garment/lobed benchmark scenes are deterministic generator
outputs (~2 h to regenerate on a 1-core box) and were wiped once by a
container reset; the sha256 manifest makes every recorded benchmark row
re-checkable against the exact scene bytes it was scored on.

Usage: python scripts/check_scene_manifest.py [--update]
  --update  rewrite the manifest from the scenes currently on disk
"""

import argparse
import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(ROOT, "docs", "SCENE_MANIFEST.json")
SCENES = {
    "garment_49v_1600x1200": "data/synthetic/garment",
    "lobed_49v_1600x1200": "data/synthetic/lobed",
}


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--scenes", default=None,
                    help="comma-separated scene-name substrings to check "
                         "(e.g. 'garment'); default: all")
    args = ap.parse_args()
    scenes = dict(SCENES)
    if args.scenes:
        keep = args.scenes.split(",")
        scenes = {k: v for k, v in scenes.items()
                  if any(s in k for s in keep)}

    if args.update:
        # merge into the committed manifest so a filtered --update never
        # drops the other scene's hashes
        man = json.load(open(MANIFEST)) if os.path.exists(MANIFEST) else {}
        for key, rel in scenes.items():
            d = os.path.join(ROOT, rel)
            files = ["cameras.npz"] + sorted(
                os.path.join(sub, f)
                for sub in ("image", "mask")
                if os.path.isdir(os.path.join(d, sub))
                for f in os.listdir(os.path.join(d, sub))
            )
            man[key] = {f: sha256(os.path.join(d, f)) for f in files}
        with open(MANIFEST, "w") as f:
            json.dump(man, f, indent=0)
        print(f"wrote {MANIFEST}")
        return 0

    man = json.load(open(MANIFEST))
    ok = bad = 0
    for key, rel in scenes.items():
        d = os.path.join(ROOT, rel)
        for f, want in man.get(key, {}).items():
            p = os.path.join(d, f)
            if not os.path.exists(p):
                print(f"MISSING  {p}")
                bad += 1
            elif sha256(p) != want:
                print(f"MISMATCH {p}")
                bad += 1
            else:
                ok += 1
    print(f"ok={ok} bad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
