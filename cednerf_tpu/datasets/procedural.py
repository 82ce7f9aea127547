"""A tiny procedural dynamic scene for integration tests: an opaque colored
ball that drifts with time, rendered analytically by ray-sphere intersection.
No dataset files needed; exposes the sampler protocol the Trainer expects."""

import numpy as np

from cednerf_tpu.datasets.rays import pinhole_rays, viewmatrix


BALL_COLOR = np.array([0.9, 0.25, 0.1], np.float32)
BG = np.array([1.0, 1.0, 1.0], np.float32)
RADIUS = 0.5


def ball_center(t):
    return np.array([0.3 * (t - 0.5), 0.0, 0.0], np.float32)


def render_gt(origins, viewdirs, t):
    """Analytic opaque-sphere render: ball color where the ray hits, else bg."""
    c = ball_center(t)
    oc = origins - c
    b = np.sum(oc * viewdirs, axis=-1)
    disc = b ** 2 - (np.sum(oc * oc, axis=-1) - RADIUS ** 2)
    hit = (disc > 0) & (-b - np.sqrt(np.maximum(disc, 0)) > 0)
    return np.where(hit[:, None], BALL_COLOR, BG).astype(np.float32)


class BallScene:
    """Sampler protocol: sample(num_rays, key) + timestamps_pool + eval rays."""

    #: When True, the camera index IS the time index (one observation per
    #: timestep — the monocular/vrig capture regime); requires
    #: n_cams == n_times. Class attr so every sampler variant honors it.
    monocular = False

    def __init__(self, n_cams: int = 6, wh: int = 48, n_times: int = 4, seed: int = 0):
        self.wh = wh
        focal = wh * 1.1
        self.K = np.array(
            [[focal, 0, wh / 2], [0, focal, wh / 2], [0, 0, 1]], np.float32
        )
        self.c2ws = []
        for i in range(n_cams):
            th = 2 * np.pi * i / n_cams
            pos = np.array([3.0 * np.cos(th), 3.0 * np.sin(th), 1.0], np.float32)
            # OpenGL camera: -z looks at the origin -> z axis points away
            self.c2ws.append(viewmatrix(pos, np.array([0.0, 0, 1]), pos))
        self.c2ws = np.stack(self.c2ws).astype(np.float32)
        self.times = np.linspace(0, 1, n_times).astype(np.float32)
        self._rng = np.random.default_rng(seed)

    @property
    def timestamps_pool(self):
        return self.times.reshape(-1, 1)

    def _render_gt(self, origins, viewdirs, t):
        # subclasses override with their own analytic renderer; image_rays/
        # eval_view must dispatch through this so train-view GT matches the
        # scene actually trained on
        return render_gt(origins, viewdirs, t)

    def sample(self, num_rays: int, key=None) -> dict:
        rng = self._rng
        ti = rng.integers(0, len(self.times), num_rays)
        cam = ti if self.monocular else rng.integers(0, len(self.c2ws),
                                                     num_rays)
        x = rng.integers(0, self.wh, num_rays).astype(np.float32)
        y = rng.integers(0, self.wh, num_rays).astype(np.float32)
        origins, viewdirs, _ = pinhole_rays(x, y, self.K, self.c2ws[cam], True)
        t = self.times[ti]
        pixels = np.empty((num_rays, 3), np.float32)
        for k in range(len(self.times)):
            m = ti == k
            if m.any():
                pixels[m] = render_gt(origins[m], viewdirs[m], self.times[k])
        return {
            "origins": origins,
            "viewdirs": viewdirs,
            "pixels": pixels,
            "timestamps": t.reshape(-1, 1),
            "color_bkgd": BG.copy(),
        }

    def device_sampler(self):
        """(data, sample_fn) pair for the scanned on-device training path:
        rays are generated and ground truth rendered analytically in-jit."""
        import jax
        import jax.numpy as jnp

        from cednerf_tpu.engine.sampling import pinhole_rays_device

        data = {
            "c2ws": jnp.asarray(self.c2ws),
            "K": jnp.asarray(self.K),
            "times": jnp.asarray(self.times),
        }
        wh = self.wh
        radius2 = RADIUS ** 2
        ball_color = jnp.asarray(BALL_COLOR)
        bg = jnp.asarray(BG)

        mono = self.monocular

        def sample(d, key, n_rays: int, i=None):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            cam = jax.random.randint(k1, (n_rays,), 0, d["c2ws"].shape[0])
            ti = jax.random.randint(k2, (n_rays,), 0, d["times"].shape[0])
            if mono:           # monocular capture: the time picks the camera
                cam = ti
            x = jax.random.randint(k3, (n_rays,), 0, wh).astype(jnp.float32)
            y = jax.random.randint(k4, (n_rays,), 0, wh).astype(jnp.float32)
            origins, viewdirs = pinhole_rays_device(x, y, d["K"], d["c2ws"][cam],
                                                    True)
            t = d["times"][ti]
            center = jnp.stack(
                [0.3 * (t - 0.5), jnp.zeros_like(t), jnp.zeros_like(t)], -1)
            oc = origins - center
            b = jnp.sum(oc * viewdirs, axis=-1)
            disc = b ** 2 - (jnp.sum(oc * oc, -1) - radius2)
            hit = (disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0)) > 0)
            pixels = jnp.where(hit[:, None], ball_color, bg)
            return {
                "origins": origins,
                "viewdirs": viewdirs,
                "pixels": pixels,
                "timestamps": t.reshape(-1, 1),
                "color_bkgd": bg,
            }

        return data, sample

    def eval_view(self, theta: float, t: float):
        """Held-out full image from a novel camera angle: (gt, origins, dirs)."""
        pos = np.array([3.0 * np.cos(theta), 3.0 * np.sin(theta), 1.0],
                       np.float32)
        c2w = viewmatrix(pos, np.array([0.0, 0, 1]), pos).astype(np.float32)
        x, y = np.meshgrid(np.arange(self.wh, dtype=np.float32),
                           np.arange(self.wh, dtype=np.float32), indexing="xy")
        x, y = x.reshape(-1), y.reshape(-1)
        c2ws = np.broadcast_to(c2w, (x.shape[0], 3, 4))
        origins, viewdirs, _ = pinhole_rays(x, y, self.K, c2ws, True)
        gt = self._render_gt(origins, viewdirs, t)
        wh = self.wh
        return (gt.reshape(wh, wh, 3), origins.reshape(wh, wh, 3),
                viewdirs.reshape(wh, wh, 3))

    def image_rays(self, cam: int, t: float) -> dict:
        x, y = np.meshgrid(np.arange(self.wh, dtype=np.float32),
                           np.arange(self.wh, dtype=np.float32), indexing="xy")
        x, y = x.reshape(-1), y.reshape(-1)
        c2w = np.broadcast_to(self.c2ws[cam], (x.shape[0], 3, 4))
        origins, viewdirs, _ = pinhole_rays(x, y, self.K, c2w, True)
        pixels = self._render_gt(origins, viewdirs, t)
        return {
            "origins": origins.reshape(self.wh, self.wh, 3),
            "viewdirs": viewdirs.reshape(self.wh, self.wh, 3),
            "pixels": pixels.reshape(self.wh, self.wh, 3),
            "timestamp": t,
            "color_bkgd": BG.copy(),
        }


class BallCloudScene(BallScene):
    """Denser dynamic scene: K drifting opaque spheres filling the box.

    A single small ball trains to a thin occupied shell (~3 valid
    samples/ray) — unrepresentative of real captures, where the reference
    sustains tens of samples per ray. The cloud keeps many occupied surfaces
    along most rays, giving a realistic per-ray sample load for benchmarks.
    GT render: color of the nearest sphere hit, else background.
    """

    def __init__(self, n_cams: int = 8, wh: int = 128, n_times: int = 8,
                 n_balls: int = 48, seed: int = 0):
        super().__init__(n_cams=n_cams, wh=wh, n_times=n_times, seed=seed)
        rng = np.random.default_rng(seed + 1)
        self.centers0 = rng.uniform(-0.9, 0.9, (n_balls, 3)).astype(np.float32)
        self.vels = rng.uniform(-0.4, 0.4, (n_balls, 3)).astype(np.float32)
        self.radii = rng.uniform(0.12, 0.3, (n_balls,)).astype(np.float32)
        self.colors = rng.uniform(0.1, 1.0, (n_balls, 3)).astype(np.float32)

    def _centers(self, t):
        return self.centers0 + self.vels * (np.asarray(t, np.float32) - 0.5)

    def _render_gt(self, origins, viewdirs, t):
        c = self._centers(t)  # [K, 3]
        oc = origins[:, None, :] - c[None]  # [N, K, 3]
        b = np.sum(oc * viewdirs[:, None, :], axis=-1)  # [N, K]
        disc = b ** 2 - (np.sum(oc * oc, -1) - self.radii[None] ** 2)
        tt = -b - np.sqrt(np.maximum(disc, 0))
        hit = (disc > 0) & (tt > 0)
        tt = np.where(hit, tt, np.inf)
        k = np.argmin(tt, axis=-1)
        any_hit = np.isfinite(tt[np.arange(len(k)), k])
        return np.where(any_hit[:, None], self.colors[k], BG).astype(np.float32)

    def sample(self, num_rays: int, key=None) -> dict:
        rng = self._rng
        ti = rng.integers(0, len(self.times), num_rays)
        cam = ti if self.monocular else rng.integers(0, len(self.c2ws),
                                                     num_rays)
        x = rng.integers(0, self.wh, num_rays).astype(np.float32)
        y = rng.integers(0, self.wh, num_rays).astype(np.float32)
        origins, viewdirs, _ = pinhole_rays(x, y, self.K, self.c2ws[cam], True)
        t = self.times[ti]
        pixels = np.empty((num_rays, 3), np.float32)
        for k in range(len(self.times)):
            m = ti == k
            if m.any():
                pixels[m] = self._render_gt(origins[m], viewdirs[m],
                                            self.times[k])
        return {
            "origins": origins,
            "viewdirs": viewdirs,
            "pixels": pixels,
            "timestamps": t.reshape(-1, 1),
            "color_bkgd": BG.copy(),
        }

    def device_sampler(self):
        import jax
        import jax.numpy as jnp

        from cednerf_tpu.engine.sampling import pinhole_rays_device

        data = {
            "c2ws": jnp.asarray(self.c2ws),
            "K": jnp.asarray(self.K),
            "times": jnp.asarray(self.times),
            "centers0": jnp.asarray(self.centers0),
            "vels": jnp.asarray(self.vels),
            "radii": jnp.asarray(self.radii),
            "colors": jnp.asarray(self.colors),
        }
        wh = self.wh
        bg = jnp.asarray(BG)

        mono = self.monocular

        def sample(d, key, n_rays: int, i=None):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            cam = jax.random.randint(k1, (n_rays,), 0, d["c2ws"].shape[0])
            ti = jax.random.randint(k2, (n_rays,), 0, d["times"].shape[0])
            if mono:           # monocular capture: the time picks the camera
                cam = ti
            x = jax.random.randint(k3, (n_rays,), 0, wh).astype(jnp.float32)
            y = jax.random.randint(k4, (n_rays,), 0, wh).astype(jnp.float32)
            origins, viewdirs = pinhole_rays_device(x, y, d["K"],
                                                    d["c2ws"][cam], True)
            t = d["times"][ti]
            c = d["centers0"][None] + d["vels"][None] * (t[:, None, None] - 0.5)
            oc = origins[:, None, :] - c  # [N, K, 3]
            b = jnp.sum(oc * viewdirs[:, None, :], axis=-1)
            disc = b ** 2 - (jnp.sum(oc * oc, -1) - d["radii"][None] ** 2)
            tt = -b - jnp.sqrt(jnp.maximum(disc, 0))
            hit = (disc > 0) & (tt > 0)
            tt = jnp.where(hit, tt, jnp.inf)
            k = jnp.argmin(tt, axis=-1)
            any_hit = jnp.isfinite(jnp.take_along_axis(tt, k[:, None], 1)[:, 0])
            pixels = jnp.where(any_hit[:, None], d["colors"][k], bg)
            return {
                "origins": origins,
                "viewdirs": viewdirs,
                "pixels": pixels,
                "timestamps": t.reshape(-1, 1),
                "color_bkgd": bg,
            }

        return data, sample


class TexturedCloudScene(BallCloudScene):
    """Adversarial encoder-gate scene: many spheres with high-frequency
    surface texture (VERDICT r1 item 3).

    Surface color is modulated by a per-ball 3D sinusoid of the HIT POINT
    at spatial frequencies 30-120 rad/unit — features of ~0.05-0.2 units
    that only the finest hash levels (res >= ~500) can represent. The
    aggregate sphere surface occupies ~4M+ fine-level cells, far above the
    2^20 corner slots of a capped table, so fine levels run deep into hash
    collisions — the regime where the brick layout's brick-granularity
    hashing (ops/brick_grid.py docstring) could diverge from the
    reference's per-corner hashing (hash_encoder_half.py:66-103). The
    ball/cloud gates cannot reach this regime.
    """

    def __init__(self, n_cams: int = 8, wh: int = 128, n_times: int = 8,
                 n_balls: int = 64, seed: int = 0):
        super().__init__(n_cams=n_cams, wh=wh, n_times=n_times,
                         n_balls=n_balls, seed=seed)
        rng = np.random.default_rng(seed + 7)
        self.radii = rng.uniform(0.08, 0.22, (n_balls,)).astype(np.float32)
        self.tex_freq = rng.uniform(30.0, 120.0, (n_balls,)).astype(np.float32)
        self.tex_phase = rng.uniform(0, 2 * np.pi, (n_balls, 3)).astype(np.float32)

    def _texture(self, xp, k):
        """Modulation in [0.1, 1.0] from the 3D sinusoid of hit point xp."""
        f = self.tex_freq[k][:, None]
        ph = self.tex_phase[k]
        s = np.sin(xp * f + ph)
        return (0.55 + 0.45 * s[:, 0] * s[:, 1] * s[:, 2])[:, None]

    def _render_gt(self, origins, viewdirs, t):
        c = self._centers(t)
        oc = origins[:, None, :] - c[None]
        b = np.sum(oc * viewdirs[:, None, :], axis=-1)
        disc = b ** 2 - (np.sum(oc * oc, -1) - self.radii[None] ** 2)
        tt = -b - np.sqrt(np.maximum(disc, 0))
        hit = (disc > 0) & (tt > 0)
        tt = np.where(hit, tt, np.inf)
        k = np.argmin(tt, axis=-1)
        t_hit = tt[np.arange(len(k)), k]
        any_hit = np.isfinite(t_hit)
        xp = origins + viewdirs * np.where(any_hit, t_hit, 0.0)[:, None]
        col = self.colors[k] * self._texture(xp, k)
        return np.where(any_hit[:, None], col, BG).astype(np.float32)

    def device_sampler(self):
        import jax
        import jax.numpy as jnp

        from cednerf_tpu.engine.sampling import pinhole_rays_device

        data = {
            "c2ws": jnp.asarray(self.c2ws),
            "K": jnp.asarray(self.K),
            "times": jnp.asarray(self.times),
            "centers0": jnp.asarray(self.centers0),
            "vels": jnp.asarray(self.vels),
            "radii": jnp.asarray(self.radii),
            "colors": jnp.asarray(self.colors),
            "tex_freq": jnp.asarray(self.tex_freq),
            "tex_phase": jnp.asarray(self.tex_phase),
        }
        wh = self.wh
        bg = jnp.asarray(BG)

        mono = self.monocular

        def sample(d, key, n_rays: int, i=None):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            cam = jax.random.randint(k1, (n_rays,), 0, d["c2ws"].shape[0])
            ti = jax.random.randint(k2, (n_rays,), 0, d["times"].shape[0])
            if mono:           # monocular capture: the time picks the camera
                cam = ti
            x = jax.random.randint(k3, (n_rays,), 0, wh).astype(jnp.float32)
            y = jax.random.randint(k4, (n_rays,), 0, wh).astype(jnp.float32)
            origins, viewdirs = pinhole_rays_device(x, y, d["K"],
                                                    d["c2ws"][cam], True)
            t = d["times"][ti]
            c = d["centers0"][None] + d["vels"][None] * (t[:, None, None] - 0.5)
            oc = origins[:, None, :] - c
            b = jnp.sum(oc * viewdirs[:, None, :], axis=-1)
            disc = b ** 2 - (jnp.sum(oc * oc, -1) - d["radii"][None] ** 2)
            tt = -b - jnp.sqrt(jnp.maximum(disc, 0))
            hit = (disc > 0) & (tt > 0)
            tt = jnp.where(hit, tt, jnp.inf)
            k = jnp.argmin(tt, axis=-1)
            t_hit = jnp.take_along_axis(tt, k[:, None], 1)[:, 0]
            any_hit = jnp.isfinite(t_hit)
            xp = origins + viewdirs * jnp.where(any_hit, t_hit, 0.0)[:, None]
            s = jnp.sin(xp * d["tex_freq"][k][:, None] + d["tex_phase"][k])
            tex = (0.55 + 0.45 * s[:, 0] * s[:, 1] * s[:, 2])[:, None]
            pixels = jnp.where(any_hit[:, None], d["colors"][k] * tex, bg)
            return {
                "origins": origins,
                "viewdirs": viewdirs,
                "pixels": pixels,
                "timestamps": t.reshape(-1, 1),
                "color_bkgd": bg,
            }

        return data, sample


class MonocularOrbitScene(BallCloudScene):
    """HyperNeRF-vrig-regime gate: each timestep is observed from exactly
    ONE camera of a handheld-style orbit (n_cams == n_times, camera i <->
    time i), so viewpoint and scene time are fully entangled — the capture
    regime of the reference's only published numbers (run_hyper.sh vrig
    scenes: a single moving rig camera; hypernerf.py one-image batches).
    The multi-cam ball/cloud/texture scenes sample (camera, time)
    independently (the DNeRF/DyNeRF regime) and cannot catch a model that
    leans on synchronized multi-view supervision per timestep.

    Eval protocol mirrors vrig's held-out rig: a NOVEL camera angle at a
    TRAINING time (eval_view), where a time-overfit model shows ghosting.
    """

    monocular = True

    def __init__(self, n_frames: int = 32, wh: int = 128,
                 n_balls: int = 48, seed: int = 0):
        super().__init__(n_cams=n_frames, wh=wh, n_times=n_frames,
                         n_balls=n_balls, seed=seed)
        # slow the per-ball drift to what one orbit pass can constrain
        # (full-speed balls move ~0.8 units over the sequence while each
        # region is observed during only a fraction of it)
        self.vels = (0.5 * self.vels).astype(np.float32)


class ProceduralLoader:
    """Dataset-free loader with the train_real.py dataset protocol.

    `--scene procedural` (single ball) / `--scene procedural_cloud` (dense
    multi-sphere scene) train the real pipeline end-to-end — CLI, engine,
    eval renderer, checkpointing, video, GUI — with analytic ground truth,
    no dataset files. Test split = 4 held-out camera angles x mid-sequence
    times.
    """

    TEST_VIEWS = [(0.21, 0.36), (0.93, 0.5), (1.71, 0.64), (2.6, 0.43)]

    def __init__(self, subject_id: str = "procedural", root_fp: str = "",
                 split: str = "train", num_rays=None, **_kw):
        cls = BallCloudScene if "cloud" in subject_id else BallScene
        self.scene = cls(n_cams=8, wh=128, n_times=8)
        self.split = split
        self.width = self.height = self.scene.wh
        self.K = self.scene.K
        self.camtoworlds = self.scene.c2ws

    @property
    def timestamps_pool(self):
        return self.scene.timestamps_pool

    def sample(self, num_rays: int, key=None) -> dict:
        return self.scene.sample(num_rays, key)

    def device_sampler(self):
        return self.scene.device_sampler()

    def __len__(self):
        return len(self.TEST_VIEWS)

    def image_rays(self, index: int) -> dict:
        theta, t = self.TEST_VIEWS[index]
        gt, origins, viewdirs = self.scene.eval_view(theta=theta * np.pi, t=t)
        return {
            "origins": origins,
            "viewdirs": viewdirs,
            "pixels": gt,
            "timestamp": t,
            "color_bkgd": BG.copy(),
        }

    def render_poses(self, n_frames: int = 60) -> dict:
        from .rays import generate_hemispherical_orbit

        return {"c2w": generate_hemispherical_orbit(self.camtoworlds, n_frames)}

    def pose_rays(self, poses: dict, index: int) -> dict:
        from .rays import pinhole_rays

        c2w_one = poses["c2w"][index]
        x, y = np.meshgrid(np.arange(self.width, dtype=np.float32),
                           np.arange(self.height, dtype=np.float32),
                           indexing="xy")
        x, y = x.reshape(-1), y.reshape(-1)
        c2w = np.broadcast_to(c2w_one, (x.shape[0], 3, 4))
        origins, viewdirs, _ = pinhole_rays(x, y, self.K, c2w, True)
        hw = (self.height, self.width)
        return {
            "origins": origins.reshape(*hw, 3),
            "viewdirs": viewdirs.reshape(*hw, 3),
            "timestamp": index / len(poses["c2w"]),
        }
