"""TensorBoard metric logging.

Parity target: log_loss / log_psnr (ref: src/loss.py:76-102, train.py:26-28,
187-192). Scalar names match the reference exactly:
cls_<id>/{depth,color,opacity,reg_shape,reg_texture,psnr}, background/*.
"""

from __future__ import annotations

import os


class MetricsWriter:
    def __init__(self, log_dir: str):
        events_dir = os.path.join(log_dir, "events")
        os.makedirs(events_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir=events_dir)
        except Exception:
            self._writer = None
        self._scalar_log = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def log_step(self, session, metrics, iteration: int) -> None:
        import json

        d = session.metrics_to_dict(metrics)
        d["iteration"] = iteration
        if self._writer is not None:
            for i, cid in enumerate(session.cls_ids):
                pre = f"cls_{cid}/"
                self._writer.add_scalar(pre + "depth", float(metrics.cat_depth[i]), iteration)
                self._writer.add_scalar(pre + "color", float(metrics.cat_color[i]), iteration)
                self._writer.add_scalar(pre + "opacity", float(metrics.cat_opacity[i]), iteration)
                self._writer.add_scalar(pre + "psnr", float(metrics.cat_psnr[i]), iteration)
                self._writer.add_scalar(pre + "reg_shape", float(metrics.reg_shape[i]), iteration)
                self._writer.add_scalar(pre + "reg_texture", float(metrics.reg_texture[i]), iteration)
            if session.background is not None:
                self._writer.add_scalar("background/depth", float(metrics.bg_depth), iteration)
                self._writer.add_scalar("background/color", float(metrics.bg_color), iteration)
                self._writer.add_scalar("background/opacity", float(metrics.bg_opacity), iteration)
                self._writer.add_scalar("background/psnr", float(metrics.bg_psnr), iteration)
        self._scalar_log.write(json.dumps(d) + "\n")
        self._scalar_log.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
        self._scalar_log.close()
