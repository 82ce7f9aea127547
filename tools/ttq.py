"""Time-to-quality tracking shared by the validation tools.

The reference's only published numbers are wall-clock-to-quality (20k steps
to 24.4 dB mean in ~534 s, run_hyper.sh:15-16), and BASELINE.json names
"time-to-30dB PSNR" a tracked metric — so the honest cross-sampler
comparison (occupancy marching vs proposal PDF-resampling) is seconds to a
PSNR threshold, not samples/s at fixed work (the prop path deliberately
places ~3x fewer samples per ray).

Wall clock starts at construction and INCLUDES compilation of the first
chunk; `compile_s_estimate` (first chunk minus the median later chunk)
separates it after the fact. With the persistent JAX compile cache warm
(cednerf_tpu.utils.enable_compile_cache), repeat runs pay ~none.
"""

import time


class TTQTracker:
    """Records wall-clock when the per-chunk train PSNR first crosses each
    threshold. `update` is called once per dispatched chunk with the chunk's
    mean PSNR (already a 16-step average — no extra smoothing applied)."""

    def __init__(self, thresholds_db):
        self.thresholds = sorted(float(t) for t in thresholds_db)
        self.hits = {}          # threshold -> (wall_s, step)
        self.history = []       # (step, wall_s, psnr)
        self._chunk_times = []
        self._t0 = time.perf_counter()
        self._t_last = self._t0

    def update(self, step: int, psnr: float):
        now = time.perf_counter()
        wall = now - self._t0
        self._chunk_times.append(now - self._t_last)
        self._t_last = now
        self.history.append((step, round(wall, 2), round(psnr, 3)))
        for th in self.thresholds:
            if th not in self.hits and psnr >= th:
                self.hits[th] = (round(wall, 1), step)

    def result(self) -> dict:
        times = sorted(self._chunk_times)
        med = times[len(times) // 2] if times else 0.0
        first = self._chunk_times[0] if self._chunk_times else 0.0
        return {
            "ttq_s": {f"{th:g}": (list(self.hits[th]) if th in self.hits
                                  else None)
                      for th in self.thresholds},
            "compile_s_estimate": round(max(first - med, 0.0), 1),
            "median_chunk_s": round(med, 3),
        }
