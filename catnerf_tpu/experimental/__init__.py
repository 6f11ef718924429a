"""Experimental modules, NOT on any default path.

`fused_field` holds the hand-written Pallas field kernels. Measured verdicts
(CLAUDE.md, scripts/exp_kernel*.py, scripts/exp_mesh_kernel.py): XLA's
batched matmuls beat them at both the training shapes (W=32 MLPs, ~2k
rows/category) and mesh-eval shapes (262k-point tiles), so they ship
disabled (`cfg.use_fused_kernels=False`) and `train/step.py` imports this
package lazily, only when that flag is set.
"""
