"""HTTP serving layer tests (catnerf_tpu/serve.py)."""

import json
import threading
import urllib.request

import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.serve import serve
from catnerf_tpu.train.loop import TrainingSession


def _session():
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=3)
    return TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)


def test_serve_endpoints():
    sess = _session()
    httpd = serve(sess, port=0)  # OS-assigned free port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and len(health["objects"]) == 4

        obj = health["objects"][0]
        # w/h/bins snap to the program-cache whitelist: a 100x80x9 request
        # renders at the nearest allowed 160x120x16
        url = f"{base}/object?id={obj}&az=30&el=20&w=100&h=80&bins=9"
        with urllib.request.urlopen(url, timeout=300) as r:
            assert r.headers["Content-Type"] == "image/png"
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        import cv2

        img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
        assert img.shape == (120, 160, 3)

        url = f"{base}/scene?frame=0&w=160&h=120&bins=16"
        with urllib.request.urlopen(url, timeout=300) as r:
            assert r.headers["Content-Type"] == "image/png"
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"

        url = f"{base}/scene?az=45&el=30&radius=4&w=160&h=120&bins=16"
        with urllib.request.urlopen(url, timeout=300) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"

        # bad requests come back as structured 4xx, not a dead socket
        try:
            urllib.request.urlopen(f"{base}/object?az=1", timeout=30)
            raise AssertionError("missing id should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
            raise AssertionError("unknown path should 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def test_viewer_page():
    """GET / (and /viewer) serves the built-in HTML viewer, lock-free."""
    sess = _session()
    httpd = serve(sess, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        for path in ("/", "/viewer"):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=30) as r:
                assert r.headers["Content-Type"].startswith("text/html")
                page = r.read().decode()
            # the page drives the real endpoints
            for ep in ("/health", "/object", "/scene"):
                assert ep in page
        # junk size params must not fail the liveness probe or the page:
        # w/h/bins are only parsed by the branches that render
        for path in ("/health?w=abc&bins=zzz", "/?w=abc"):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=30) as r:
                assert r.status == 200
    finally:
        httpd.shutdown()


def test_size_snapping_whitelist():
    from catnerf_tpu.serve import _BINS, _SIZES, _snap

    assert _snap((100, 80), _SIZES) == (160, 120)
    assert _snap((320, 240), _SIZES) == (320, 240)
    assert _snap((2000, 2000), _SIZES) == (1280, 960)
    assert _snap(9, _BINS) == 16
    assert _snap(64, _BINS) == 64
    assert _snap(10000, _BINS) == 192


def test_orbit_frame_and_eye():
    from catnerf_tpu.render_views import orbit_eye, orbit_frame

    extent = np.array([0.6, 0.6, 0.6])
    r, near, far = orbit_frame(extent)
    half_diag = 0.5 * np.linalg.norm(extent)
    np.testing.assert_allclose(r, 2.2 * half_diag)
    assert 0 < near < r < far
    np.testing.assert_allclose(far - r, 1.3 * half_diag)
    # explicit radius respected
    r2, near2, far2 = orbit_frame(extent, radius=5.0)
    assert r2 == 5.0 and near2 < 5.0 < far2

    eye = orbit_eye(0.0, 0.0, 2.0, center=(1.0, 0.0, 0.0))
    np.testing.assert_allclose(eye, [3.0, 0.0, 0.0], atol=1e-12)
    eye = orbit_eye(np.pi / 2, 0.0, 2.0)
    np.testing.assert_allclose(eye, [0.0, 2.0, 0.0], atol=1e-12)
    eye = orbit_eye(0.0, np.pi / 2, 2.0)
    np.testing.assert_allclose(eye, [0.0, 0.0, 2.0], atol=1e-12)


def test_scene_server_sharded_matches_unsharded():
    """SceneServer(device_mesh=...) serves pixel-identical scene composites
    (the tile axis shards over the mesh; only image assembly crosses
    devices)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from catnerf_tpu.parallel.mesh import make_mesh
    from catnerf_tpu.serve import SceneServer

    sess = _session()
    s1 = SceneServer(sess)
    s2 = SceneServer(sess, device_mesh=make_mesh(n_model=1))
    img1 = s1.render_scene_frame(0, 160, 120, 16)
    img2 = s2.render_scene_frame(0, 160, 120, 16)
    np.testing.assert_array_equal(img1, img2)


def test_threaded_serving_health_never_blocks():
    """The server is threaded with device work serialized on server.lock:
    /health answers while the lock is held (a long render/ingest in
    flight), and concurrent device requests all succeed, serialized."""
    import concurrent.futures as cf
    import time

    from catnerf_tpu.serve import SceneServer

    sess = _session()
    server = SceneServer(sess)
    httpd = serve(sess, port=0, scene_server=server)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        obj = server.object_ids()[0]
        url = f"{base}/object?id={obj}&az=10&el=20&w=160&h=120&bins=16"
        with urllib.request.urlopen(url, timeout=300) as r:
            r.read()  # compile the program before the timed phase

        # hold the device lock (simulating a long ingest): /health still
        # answers within a tight timeout, /object queues behind the lock
        with server.lock:
            t0 = time.time()
            with urllib.request.urlopen(f"{base}/health", timeout=10) as r:
                assert json.loads(r.read())["ok"]
            assert time.time() - t0 < 10.0
            pool = cf.ThreadPoolExecutor(2)
            fut = pool.submit(
                lambda: urllib.request.urlopen(url, timeout=300).read())
            time.sleep(0.3)
            assert not fut.done()  # blocked on the held lock
        png = fut.result(timeout=300)  # lock released -> completes
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # concurrent device requests: all succeed
        urls = [f"{base}/object?id={obj}&az={a}&el=20&w=160&h=120&bins=16"
                for a in (0, 40, 80, 120)]
        with cf.ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(
                lambda u: urllib.request.urlopen(u, timeout=300).read(),
                urls))
        assert all(o[:8] == b"\x89PNG\r\n\x1a\n" for o in outs)
    finally:
        httpd.shutdown()


def test_ingest_endpoint():
    """POST /ingest: raw posed RGB-D observations of an unseen instance ->
    register -> fit -> adopt -> served immediately on the same socket."""
    import copy
    import io
    import urllib.error

    from catnerf_tpu.data.synthetic import make_scene as make_scene3

    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    # 64x48: at 48x36 the held-out instance's bbox sits exactly at the
    # loaders' 10-px floor in 2 of 3 frames, so they'd be (correctly) skipped
    scene = make_scene3(n_frames=3, width=64, height=48, n_categories=1,
                        insts_per_cat=3, seed=11)
    cls_id = [c for c in scene.inst_dict if c != 0][0]
    held_out = sorted(scene.inst_dict[cls_id])[-1]
    inst_dict_train = copy.deepcopy(scene.inst_dict)
    del inst_dict_train[cls_id][held_out]
    from catnerf_tpu.train.loop import TrainingSession as TS

    sess = TS(cfg, inst_dict_train, scene.sample_dict, cam=scene.cam)
    for _ in range(3):
        sess.step_once()

    frames = sorted(scene.sample_dict)
    rgb = np.stack([scene.sample_dict[f]["image"] for f in frames])
    depth = np.stack([scene.sample_dict[f]["depth"] for f in frames])
    mask = np.stack([(scene.sample_dict[f]["obj_mask"] == held_out)
                     for f in frames]).astype(np.int8)
    T_wc = np.stack([scene.sample_dict[f]["T"] for f in frames])
    buf = io.BytesIO()
    np.savez(buf, rgb=rgb, depth=depth, mask=mask, T_wc=T_wc)
    body = buf.getvalue()

    httpd = serve(sess, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            f"{base}/ingest?cls={cls_id}&steps=20&rays=64", data=body,
            method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert out["adopted"] and out["cls"] == cls_id
        assert out["frames_used"] == len(frames)
        new_id = out["id"]
        assert new_id not in (1, 2)  # fresh id from the flat namespace

        with urllib.request.urlopen(f"{base}/health", timeout=30) as r:
            assert new_id in json.loads(r.read())["objects"]
        url = f"{base}/object?id={new_id}&az=30&el=20&w=160&h=120&bins=16"
        with urllib.request.urlopen(url, timeout=300) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"

        # malformed payloads come back as 400s, not dead sockets
        for bad_url, bad_body in (
                (f"{base}/ingest?cls={cls_id}", b"not an npz"),
                (f"{base}/ingest?cls=424242", body),
                (f"{base}/nope", body)):
            req = urllib.request.Request(bad_url, data=bad_body,
                                         method="POST")
            try:
                urllib.request.urlopen(req, timeout=300)
                raise AssertionError(f"{bad_url} should fail")
            except urllib.error.HTTPError as e:
                assert e.code in (400, 404)
    finally:
        httpd.shutdown()


def test_edit_endpoint():
    """/edit: live latent-code editing over HTTP — texture transfer,
    interpolation, category prior; bad requests 400."""
    import urllib.error

    sess = _session()
    httpd = serve(sess, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/health", timeout=30) as r:
            objs = json.loads(r.read())["objects"]
        # find two instances of the same category
        cat = sess.categories[0]
        a, b = cat.obj_ids[0], cat.obj_ids[1]
        for params in (f"texture_from={b}", f"interp={b}&t=0.5", "mean=1"):
            url = (f"{base}/edit?id={a}&{params}&az=30&el=20"
                   "&w=160&h=120&bins=16")
            with urllib.request.urlopen(url, timeout=300) as r:
                assert r.headers["Content-Type"] == "image/png"
                assert r.read()[:8] == b"\x89PNG\r\n\x1a\n", params

        # no edit given -> 400; cross-category donor -> 400
        for bad in (f"{base}/edit?id={a}&w=160&h=120&bins=16",
                    f"{base}/edit?id={a}&texture_from=99999"
                    "&w=160&h=120&bins=16"):
            try:
                urllib.request.urlopen(bad, timeout=300)
                raise AssertionError(f"{bad} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        del objs
    finally:
        httpd.shutdown()
