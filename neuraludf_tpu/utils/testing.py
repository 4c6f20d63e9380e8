"""Tiny in-memory configs/scenes for self-tests, dry runs, and unit tests.

These back both the repo-root driver entry (__graft_entry__) and the
package-internal self-tests (parallel/multihost.py), so the installed
package never depends on repo-root scaffolding.
"""

from __future__ import annotations

import numpy as np


def tiny_config(batch_size: int = 64):
    """A miniature flagship config (small MLPs, few samples) that exercises
    every code path of the full DTU configuration."""
    from ..config import (
        Config, ModelConfig, NeRFConfig, RendererConfig,
        RenderingNetworkConfig, TrainConfig, UDFNetworkConfig,
    )

    return Config(
        train=TrainConfig(batch_size=batch_size, warm_up_end=10, anneal_end=20, end_iter=100),
        model=ModelConfig(
            nerf=NeRFConfig(D=2, W=32, multires=4, multires_view=2, skips=(0,)),
            udf_network=UDFNetworkConfig(d_out=33, d_hidden=32, n_layers=4, skip_in=(2,), multires=4),
            rendering_network=RenderingNetworkConfig(d_feature=32, d_hidden=32, n_layers=2),
            udf_renderer=RendererConfig(n_samples=16, n_importance=10, n_outside=4, up_sample_steps=5),
        ),
    )


def synthetic_scene_arrays(key, n_views: int = 4, H: int = 32, W: int = 40):
    """In-memory scene pytree (no files): random images, a DTU-like camera
    ring, and the ref/src pairing table."""
    import jax
    import jax.numpy as jnp

    from ..data.synthetic import look_at_pose

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 48.0
    K[0, 2], K[1, 2] = W / 2.0, H / 2.0
    poses, intr = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        loc = 2.2 * np.array([np.sin(ang), 0.2, -np.cos(ang)], np.float32)
        poses.append(look_at_pose(loc))
        intr.append(K)
    intr = jnp.asarray(np.stack(intr))
    images = jax.random.uniform(key, (n_views, H, W, 3))
    scene = {
        "images": images,
        "masks": jnp.ones((n_views, H, W, 3)),
        "intrinsics": intr,
        "intrinsics_inv": jnp.linalg.inv(intr),
        "poses": jnp.asarray(np.stack(poses)),
    }
    ref_src_pairs = jnp.asarray(
        np.stack([
            np.roll(np.arange(n_views), -i - 1)[: min(9, n_views - 1)]
            for i in range(n_views)
        ]).astype(np.int32)
    )
    return scene, ref_src_pairs
