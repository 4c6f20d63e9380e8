from .dataset import (  # noqa: F401
    Dataset,
    near_far_from_sphere,
    rays_at,
    ref_src_info,
    sample_random_rays,
)
