"""Regenerate the 49-view benchmark scenes and record a hash manifest.

The `lobed` (DTU stand-in) and `garment` (DF3D stand-in) scenes are
deterministic analytic ray-traces (neuraludf_tpu/data/synthetic.py), so
the durable evidence is a committed manifest of content hashes
(data/synthetic/MANIFEST.json is copied to docs/SCENE_MANIFEST.json,
which IS committed): anyone can regenerate and verify byte-identity.

Usage:  nice -n 19 python scripts/regen_scenes.py [--verify-only]
"""
import argparse
import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SCENES = {
    # kind -> (n_views, H, W, focal) — exactly the benchmark scripts' params
    "lobed": (49, 1200, 1600, 2000.0),
    "garment": (49, 1200, 1600, 1600 / 1.1547),
}


def file_sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def scene_manifest(scene_dir: str) -> dict:
    out = {}
    for sub in ("image", "mask"):
        d = os.path.join(scene_dir, sub)
        for name in sorted(os.listdir(d)):
            out[f"{sub}/{name}"] = file_sha(os.path.join(d, name))
    out["cameras.npz"] = file_sha(os.path.join(scene_dir, "cameras.npz"))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-only", action="store_true")
    ap.add_argument("--scenes", default="lobed,garment")
    args = ap.parse_args()

    from neuraludf_tpu.data.synthetic import generate_scene

    base = os.path.join(ROOT, "data", "synthetic")
    manifest_path = os.path.join(ROOT, "docs", "SCENE_MANIFEST.json")
    committed = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            committed = json.load(f)

    result = dict(committed)
    for kind in args.scenes.split(","):
        n_views, H, W, focal = SCENES[kind]
        scene_dir = os.path.join(base, kind)
        if not os.path.exists(os.path.join(scene_dir, "cameras.npz")):
            if args.verify_only:
                print(f"{kind}: MISSING (no cameras.npz)")
                continue
            print(f"{kind}: generating {n_views} views {W}x{H} ...", flush=True)
            generate_scene(scene_dir, kind=kind, n_views=n_views, H=H, W=W,
                           focal=focal)
        m = scene_manifest(scene_dir)
        key = f"{kind}_{n_views}v_{W}x{H}"
        if key in committed:
            same = committed[key] == m
            print(f"{kind}: regenerated manifest "
                  f"{'MATCHES' if same else 'DIFFERS FROM'} committed one")
            if not same:
                diff = [k for k in m if committed[key].get(k) != m[k]]
                print(f"  first diffs: {diff[:5]}")
        result[key] = m
        print(f"{kind}: {len(m)} files hashed", flush=True)

    if not args.verify_only:
        os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
        with open(manifest_path, "w") as f:
            json.dump(result, f, indent=0, sort_keys=True)
        print(f"wrote {manifest_path}")


if __name__ == "__main__":
    main()
