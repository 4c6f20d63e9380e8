"""neuraludf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for learning
neural Unsigned Distance Fields from multi-view images.

Re-designed from scratch with the capabilities of NeuralUDF (CVPR 2023,
reference implementation: xxlong0/NeuralUDF). The compute path is pure JAX
(jit/vmap/grad, Pallas TPU kernels for the hot ops); host-side mesh
extraction uses a native C++ extension; scaling is done with
``jax.sharding.Mesh`` + ``shard_map`` over ICI.

Layer map (mirrors reference SURVEY.md §1):
  config/       — typed config + minimal HOCON loader        (ref: confs/*.conf)
  data/         — IDR-convention dataset + jitted ray gen    (ref: dataset/dataset.py)
  nets/         — neural fields as functional param pytrees  (ref: models/fields.py)
  render/       — UDF volume renderer + multi-view warping   (ref: models/udf_renderer_blending.py)
  losses/       — color / patch (SSIM, NCC) losses           (ref: loss/)
  train/        — jitted train step, schedules, runner       (ref: exp_runner_blending.py)
  mesh/         — grid query (TPU) + MeshUDF MC (C++ host)   (ref: extract_mesh.py, custom_mc/)
  parallel/     — device mesh / sharding helpers             (new; reference is single-GPU)
  eval/         — Chamfer / F-score offline evaluation       (ref: evaluation/)
"""

__version__ = "0.1.0"
