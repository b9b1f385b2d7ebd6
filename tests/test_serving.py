"""SamplerService: request batching, padding, determinism, shutdown."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionmodel_tpu.config import preset
from diffusionmodel_tpu.diffusion import Schedule
from diffusionmodel_tpu.nn import build_model
from diffusionmodel_tpu.serving import SamplerService


@pytest.fixture(scope="module")
def tiny():
    cfg = preset("full", **{
        "model.n_feat": 8, "model.img_size": 32, "model.n_classes": 3,
        "diffusion.n_T": 10, "sample.ddim_steps": 4,
    })
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                            cfg.diffusion.n_T)
    x = jnp.zeros((2, 32, 32, 3))
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32),
        jnp.full((2,), 0.5), jnp.ones((2,)), attn_mask=None, train=False)
    return cfg, model, sched, v["params"]


@pytest.mark.parametrize("kind", ["ddim", "dpmpp"])
def test_submit_and_batching(tiny, kind):
    cfg, model, sched, params = tiny
    if kind == "dpmpp":
        import dataclasses as _dc

        cfg = cfg.replace(sample=_dc.replace(cfg.sample, dpm_steps=4))
    with SamplerService(model, cfg, sched, params, max_batch=6,
                        sampler=kind) as svc:
        futs = [svc.submit([0, 1], guide_w=2.0) for _ in range(3)]
        outs = [f.result(timeout=120) for f in futs]
    for o in outs:
        assert o.shape == (2, 32, 32, 3)
        assert np.isfinite(o).all()


def test_seed_pinned_reproducible(tiny):
    cfg, model, sched, params = tiny
    with SamplerService(model, cfg, sched, params, max_batch=4,
                        sampler="ddim") as svc:
        a = svc.generate([0, 1, 2], guide_w=2.0, seed=7)
        b = svc.generate([0, 1, 2], guide_w=2.0, seed=7)
        c = svc.generate([0, 1, 2], guide_w=2.0, seed=8)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3  # different seed -> different images


def test_pinned_batches_with_unpinned_under_deterministic_sampler(tiny):
    """Deterministic samplers (ddim eta=0 / dpmpp): a seed-pinned request
    batches WITH other traffic and still reproduces its solo-run images
    BIT-exactly — per-slot start noise comes from the request's own seed,
    so batch composition cannot leak into the result (the determinism
    contract PARITY.md documents; ADVICE r3 asked for byte-equality)."""
    import dataclasses as _dc

    cfg, model, sched, params = tiny
    cfg = cfg.replace(sample=_dc.replace(cfg.sample, dpm_steps=4))
    with SamplerService(model, cfg, sched, params, max_batch=4,
                        sampler="dpmpp", max_wait_ms=1000.0) as svc:
        assert svc._deterministic
        a = svc.generate([0, 1], guide_w=2.0, seed=7)  # solo (+ compile)
        st0 = dict(svc.stats)
        # pinned + unpinned submitted together -> must share ONE batch
        f1 = svc.submit([0, 1], guide_w=2.0, seed=7)
        f2 = svc.submit([2, 2], guide_w=3.0)
        b, other = f1.result(), f2.result()
        st1 = dict(svc.stats)
    np.testing.assert_array_equal(a, b)
    assert st1["batches"] - st0["batches"] == 1  # they batched
    assert st1["pinned_batches"] - st0["pinned_batches"] == 1
    assert other.shape == (2, 32, 32, 3)


@pytest.mark.parametrize("kind", ["ancestral", "textbook"])
def test_pinned_batches_under_stochastic_sampler(tiny, kind):
    """Round 4 (VERDICT r3 #8): the STOCHASTIC samplers batch pinned
    requests too — per-step noise rides per-slot streams derived from
    each request's own seed (diffusion._slot_normal), so a pinned
    request's images are bit-identical to its run-alone result whatever
    shares the batch."""
    if kind == "textbook":
        from diffusionmodel_tpu.config import preset
        from diffusionmodel_tpu.nn import build_model as _bm

        cfg = preset("labml", **{
            "model.n_feat": 8, "model.img_size": 16,
            "model.ch_mults": (1, 2), "model.is_attn": (False, False),
            "model.n_blocks": 1, "diffusion.n_T": 8,
        })
        model = _bm(cfg.model, cfg.diffusion.high_thresh)
        sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                                cfg.diffusion.n_T)
        x = jnp.zeros((2, 16, 16, 3))
        v = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x,
            jnp.zeros((2,), jnp.int32), jnp.zeros((2,)), jnp.zeros((2,)),
            attn_mask=None, train=False)
        params = v["params"]
        kwargs = dict(chunk=4)
    else:
        cfg, model, sched, params = tiny
        kwargs = dict(sampler="ancestral", chunk=4)
    nc = cfg.model.n_classes
    with SamplerService(model, cfg, sched, params, max_batch=4,
                        max_wait_ms=1000.0, **kwargs) as svc:
        assert not svc._deterministic
        a = svc.generate([0, 1 % nc], guide_w=2.0, seed=7)  # solo+compile
        st0 = dict(svc.stats)
        f1 = svc.submit([0, 1 % nc], guide_w=2.0, seed=7)
        f2 = svc.submit([2 % nc], guide_w=3.0, seed=9)
        b = f1.result()
        f2.result()
        st1 = dict(svc.stats)
    np.testing.assert_array_equal(a, b)
    assert st1["batches"] - st0["batches"] == 1  # pinned requests batched
    assert st1["pinned_batches"] - st0["pinned_batches"] == 1


def test_seed_validation_at_submit(tiny):
    """ADVICE r3 (medium): invalid seeds fail at submit() — before the
    worker — so they can never poison batch neighbours; negative and
    integral-float seeds are normalized, not rejected."""
    cfg, model, sched, params = tiny
    with SamplerService(model, cfg, sched, params, max_batch=4,
                        sampler="ddim", max_wait_ms=500.0) as svc:
        with pytest.raises(ValueError):
            svc.submit([0], seed="not-an-int")
        with pytest.raises(ValueError):
            svc.submit([0], seed=1.5)
        # negative seeds (previously PRNGKey-legal) still work, mapped
        # into the np-rng domain; a bad future never reaches the worker.
        a = svc.generate([0, 1], guide_w=2.0, seed=-1)
        b = svc.generate([0, 1], guide_w=2.0, seed=-1)
        c = svc.generate([0, 1], guide_w=2.0, seed=7.0)  # JSON float
    np.testing.assert_array_equal(a, b)
    assert a.shape == c.shape == (2, 32, 32, 3)


def test_mixed_scales_and_validation(tiny):
    cfg, model, sched, params = tiny
    with SamplerService(model, cfg, sched, params, max_batch=4,
                        sampler="ddim") as svc:
        # guide_w rides a per-slot vector: different scales share a batch.
        n_runs = [0]
        real_run = svc._run

        def counting_run(*a):
            n_runs[0] += 1
            return real_run(*a)

        svc._run = counting_run
        f1 = svc.submit([0], guide_w=2.0)
        f2 = svc.submit([1], guide_w=4.0)
        f3 = svc.submit([2], guide_w=6.0)
        outs = [f.result(timeout=240) for f in (f1, f2, f3)]
        for o in outs:
            assert o.shape == (1, 32, 32, 3) and np.isfinite(o).all()
        # <= 2: at least two of the three mixed-scale requests batched
        # together (the first may run alone if it beat the others to the
        # worker; with round-2's equal-scale grouping this would be 3).
        assert n_runs[0] <= 2
        with pytest.raises(ValueError):
            svc.submit([0] * 5)  # exceeds max_batch
        with pytest.raises(ValueError):
            svc.submit([])
        with pytest.raises(ValueError):
            svc.submit([3])  # class id out of range (n_classes=3)
        with pytest.raises(ValueError):
            svc.submit([-1])
    with pytest.raises(RuntimeError):
        svc.submit([0])  # closed


def test_mixed_scale_batch_matches_solo_scales(tiny):
    """A mixed-scale batch must apply each request's own guide_w: with a
    pinned key the slot-0 image of a [w=0, w=9] batch differs from a
    [w=0, w=0] batch only in slot 1."""
    import jax.numpy as jnp

    cfg, model, sched, params = tiny
    with SamplerService(model, cfg, sched, params, max_batch=2,
                        sampler="ddim") as svc:
        key = jax.random.PRNGKey(11)
        a = np.asarray(svc._run(key, jnp.asarray([0, 1], jnp.int32),
                                jnp.asarray([0.0, 0.0], jnp.float32)))
        b = np.asarray(svc._run(key, jnp.asarray([0, 1], jnp.int32),
                                jnp.asarray([0.0, 9.0], jnp.float32)))
    np.testing.assert_allclose(a[0], b[0], atol=1e-5)
    assert np.abs(a[1] - b[1]).max() > 1e-3


def test_textbook_family_service():
    """schedule_family='textbook' serves through the unconditional
    annotated-DDPM sampler (ADVICE r2: serve mode previously generated
    garbage for labml checkpoints by forcing CFG + normalized t)."""
    cfg = preset("labml", **{
        "model.n_feat": 8, "model.img_size": 16, "model.ch_mults": (1, 2),
        "model.is_attn": (False, False), "model.n_blocks": 1,
        "diffusion.n_T": 8,
    })
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                            cfg.diffusion.n_T)
    x = jnp.zeros((2, 16, 16, 3))
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x,
        jnp.zeros((2,), jnp.int32), jnp.zeros((2,)), jnp.zeros((2,)),
        attn_mask=None, train=False)
    with SamplerService(model, cfg, sched, v["params"], max_batch=2,
                        chunk=4) as svc:
        out = svc.generate([0, 0], seed=3)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(out).all()


def test_ancestral_kind_and_mesh(tiny):
    from diffusionmodel_tpu.parallel import make_mesh

    cfg, model, sched, params = tiny
    mesh = make_mesh()
    with mesh:
        with SamplerService(model, cfg, sched, params, max_batch=8,
                            sampler="ancestral", mesh=mesh,
                            chunk=4) as svc:
            out = svc.generate([0, 1, 2, 0], guide_w=2.0, seed=3)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all()


def test_http_server_roundtrip(tiny):
    import base64
    import io
    import json as _json
    import threading
    import urllib.request

    from PIL import Image

    from diffusionmodel_tpu.serving import make_http_server

    cfg, model, sched, params = tiny
    svc = SamplerService(model, cfg, sched, params, max_batch=4,
                         sampler="ddim")
    httpd = make_http_server(svc, port=0, class_names=["a", "b", "c"])
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            h = _json.loads(r.read())
        assert h["status"] == "ok" and h["classes"] == ["a", "b", "c"]

        body = _json.dumps({"classes": ["b", 2], "guide_w": 2.0,
                            "seed": 5}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=240) as r:
            out = _json.loads(r.read())
        assert len(out["images"]) == 2
        img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
        assert img.size == (32, 32) and img.mode == "RGB"
    finally:
        httpd.shutdown()
        svc.close()


def test_stats_and_http_validation(tiny):
    """Serving observability counters + HTTP 400 for invalid classes."""
    import json as _json
    import threading
    import urllib.error
    import urllib.request

    from diffusionmodel_tpu.serving import make_http_server

    cfg, model, sched, params = tiny
    svc = SamplerService(model, cfg, sched, params, max_batch=4,
                         sampler="ddim")
    httpd = make_http_server(svc, port=0, class_names=["a", "b", "c"])
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        svc.generate([0, 1], guide_w=2.0)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            h = _json.loads(r.read())
        assert h["stats"]["requests"] >= 1
        assert h["stats"]["images"] >= 2
        assert h["stats"]["batches"] >= 1
        assert 0 < h["slot_occupancy"] <= 1
        assert h["stats"]["busy_seconds"] > 0

        # invalid classes -> 400, never a silently-wrong-class 200
        for bad in ([7], ["zebra"], [-1]):
            body = _json.dumps({"classes": bad}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req, timeout=60)
                raise AssertionError(f"classes={bad} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()
        svc.close()
