"""Live HTTP viewer: serve page + render JPEGs of the current scene."""

import urllib.request

import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
from gsplatloc_tpu.eval.viewer import LiveViewer
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera


def test_viewer_serves_page_and_renders():
    rng = np.random.default_rng(0)
    pts, rgb = random_gaussian_cloud(rng, 200)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    scene = scene._replace(scales=jnp.full_like(scene.scales, 0.08))
    K = camera.intrinsics_matrix(60.0, 60.0, 39.5, 23.5)
    viewer = LiveViewer(K, width=80, height=48, port=18742,
                        backend="reference").start()
    try:
        viewer.set_scene(scene)
        viewer.update(step=5, rays_per_sec=1e6)
        page = urllib.request.urlopen(
            "http://127.0.0.1:18742/", timeout=30).read()
        assert b"gsplatloc_tpu" in page
        jpg = urllib.request.urlopen(
            "http://127.0.0.1:18742/render?tx=0&ty=0&tz=-1&rx=0&ry=0",
            timeout=120,
        ).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
        assert len(jpg) > 500
        stats = urllib.request.urlopen(
            "http://127.0.0.1:18742/stats", timeout=30).read()
        assert b'"step": 5' in stats
        # pause toggle
        urllib.request.urlopen(
            "http://127.0.0.1:18742/toggle_pause", timeout=30).read()
        assert viewer.paused
        urllib.request.urlopen(
            "http://127.0.0.1:18742/toggle_pause", timeout=30).read()
        assert not viewer.paused
    finally:
        viewer.stop()
