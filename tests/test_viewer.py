"""Viewer server smoke test: page loads, /render returns a JPEG frame."""

import http.client
import json

import numpy as np
import jax

from cednerf_tpu.engine.config import dnerf_config
from cednerf_tpu.engine.train import create_train_state
from cednerf_tpu.models.field import DNGPRadianceField
from cednerf_tpu.viewer import ViewerServer

import dataclasses


def test_viewer_render_roundtrip():
    cfg = dataclasses.replace(
        dnerf_config(max_steps=10), grid_resolution=16,
        render_step_size=5e-2, max_march_steps=32, eval_chunk=512,
    )
    field = DNGPRadianceField(aabb=cfg.aabb, n_levels=2, dst_resolution=32,
                              base_resolution=8, log2_hashmap_size=10)
    state = create_train_state(field, cfg, jax.random.PRNGKey(0))
    import jax.numpy as jnp
    state = state._replace(occ=state.occ._replace(
        binaries=jnp.ones_like(state.occ.binaries)))

    server = ViewerServer(field, state.params, state.occ, cfg, wh=(32, 32))
    httpd = server.start(port=0)
    port = httpd.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/")
        page = conn.getresponse().read()
        assert b"cednerf_tpu viewer" in page

        c2w = np.zeros((3, 4), np.float32)
        c2w[:, :3] = np.eye(3)
        c2w[2, 3] = 4.0
        body = json.dumps({
            "c2w": c2w.reshape(-1).tolist(), "time": 0.5, "width": 32,
            "max_samples": 32, "depth": False,
        })
        conn.request("POST", "/render", body=body)
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200
        assert data[:2] == b"\xff\xd8"  # JPEG SOI
        assert resp.getheader("Content-Type") == "image/jpeg"

        conn.request("GET", "/snap")
        snap = json.loads(conn.getresponse().read())
        assert "radius" in snap
    finally:
        httpd.shutdown()
