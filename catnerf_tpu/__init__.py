"""catnerf_tpu — TPU-native category-level neural field reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`Taekbum/category-nerf-reconstruction-official` (IEEE RA-L 2024,
"Category-Level Neural Field for Reconstruction of Partially Observed
Objects in Indoor Environment").

Layer map (mirrors SURVEY.md):
  config       — scene configuration        (ref: src/cfg.py)
  data         — dataset + ray buffers      (ref: src/dataset.py, src/scene_cateogries.py)
  geometry     — category registration      (ref: src/category_registration.py, src/teaser_utils)
  models       — neural field models        (ref: src/model.py, src/embedding.py)
  ops          — rendering math, sampling   (ref: src/render_rays.py, src/loss.py)
  train        — jitted train step + driver (ref: train.py, src/trainer.py)
  mesher       — grid eval + marching cubes (ref: src/trainer.py, src/vis.py)
  metrics      — 3D eval                    (ref: metric/)
  parallel     — device-mesh sharding       (no reference equivalent; TPU-native)
  native       — C++ geometry kernels       (replaces TEASER++/Open3D/skimage deps)
"""

__version__ = "0.1.0"
