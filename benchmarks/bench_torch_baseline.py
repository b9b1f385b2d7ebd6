"""MEASURED reference baseline for BASELINE config 1 (VERDICT r2 item 2:
every vs_baseline previously divided by an analytic GPU estimate even
though torch is installed and the MNIST config is CPU-runnable).

This imports the reference's OWN script (/root/reference/MNIST_script.py —
executed for measurement, not copied) and times, on this host's CPU:

- the train hot loop (MNIST_script.py:338-349): fwd + bwd + Adam step at
  batch 256, synthetic MNIST-shaped batches (torchvision's MNIST download
  needs network; throughput does not depend on pixel content);
- the 400-step CFG sampler (MNIST_script.py:254-298) for 40 images
  (n_sample = 4 * n_classes, the script's own eval size) at guide_w=2.0.

Writes benchmarks/TORCH_BASELINE.json. The companion TPU numbers for the
same config come from benchmarks/bench_configs.py (config 1) — together
they give a measured-vs-measured speedup. The 8GB-GPU estimate for the
flagship remains an estimate and stays labeled as such (bench.py).
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time

REF = "/root/reference/MNIST_script.py"


def _stub_torchvision() -> None:
    """torchvision is not in this image; the reference imports it at module
    scope but the timed paths (DDPM forward/backward/sample) never touch
    it — inject import-satisfying stubs."""
    import types

    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    for sub in ("models", "transforms", "datasets", "utils"):
        m = types.ModuleType(f"torchvision.{sub}")
        sys.modules[f"torchvision.{sub}"] = m
        setattr(tv, sub, m)
    tv.datasets.MNIST = object
    tv.utils.save_image = tv.utils.make_grid = lambda *a, **k: None
    sys.modules["torchvision"] = tv


def load_reference():
    _stub_torchvision()
    spec = importlib.util.spec_from_file_location("ref_mnist", REF)
    mod = importlib.util.module_from_spec(spec)
    # the reference imports matplotlib/tqdm/etc at module scope; headless ok
    spec.loader.exec_module(mod)
    return mod


def load_reference_flagship():
    """scripy_old.py — the reference's proven-runnable FULL-SIZE config
    (SURVEY Q3: new_scripy.py's literal LocalEnhancer wiring cannot
    execute; scripy_old is the 'proven full-size config' per SURVEY 2.2):
    256px, n_feat=192, n_T=700, batch 1, weighted-MSE + feature-
    consistency loss."""
    _stub_torchvision()
    spec = importlib.util.spec_from_file_location(
        "ref_old", "/root/reference/scripy_old.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def flagship_baseline() -> None:
    """Measure the flagship-config torch train step on this host's CPU
    (the only torch device present) and merge it into
    TORCH_BASELINE.json under ``flagship``. The companion TPU number is
    bench.py's train_opt_steps_per_sec (same 353M network semantics,
    batch 1). Sampling is NOT measured here: 700 doubled-batch steps of
    the 353M net at ~30s/forward would take most of a day on one core —
    the sampler anchor stays the analytic GPU estimate, labeled."""
    import torch

    ref = load_reference_flagship()
    torch.manual_seed(0)
    n_T, n_classes, n_feat, batch, size = 700, 5, 192, 1, 256

    ddpm = ref.DDPM(
        nn_model=ref.ContextUnet(in_channels=3, n_feat=n_feat,
                                 n_classes=n_classes),
        betas=(1e-4, 0.02), n_T=n_T, device="cpu", drop_prob=0.1)
    opt = torch.optim.AdamW(ddpm.parameters(), lr=1e-4, weight_decay=1e-5)

    x = torch.rand(batch, 3, size, size) * 2 - 1
    c = torch.randint(0, n_classes, (batch,))
    mask = torch.full((batch, size, size), 0.5)
    mask[:, size // 2:] = 1.0
    mask[:, 160:224, 96:160] = 1.5

    ddpm.train()
    n_warm, n_meas = 1, 2
    for i in range(n_warm + n_meas):
        if i == n_warm:
            t0 = time.time()
        opt.zero_grad()
        loss = ddpm(x, c, mask)
        loss.backward()
        opt.step()
    step_s = (time.time() - t0) / n_meas
    n_params = sum(p.numel() for p in ddpm.parameters())

    path = "benchmarks/TORCH_BASELINE.json"
    try:
        with open(path) as f:
            doc = json.load(f)
    except FileNotFoundError:
        doc = {}
    doc["flagship"] = {
        "config": "flagship full-size config (scripy_old.py: 256px, "
                  "n_feat=192, n_T=700, batch 1), torch CPU, MEASURED",
        "torch": torch.__version__,
        "n_params": n_params,
        "batch": batch,
        "train_step_seconds": round(step_s, 2),
        "train_steps_per_sec": round(1.0 / step_s, 5),
        "train_images_per_sec": round(batch / step_s, 5),
        "loss_final": round(float(loss.item()), 4),
        "note": "fwd+bwd+AdamW of the reference's own 353M network on "
                "the 1-core CPU (no GPU in this image); sampler "
                "deliberately unmeasured (see flagship_baseline "
                "docstring)",
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc["flagship"]))


def main() -> None:
    import torch

    ref = load_reference()
    torch.manual_seed(0)
    device = "cpu"  # this host has no GPU; config 1 is the CPU-runnable one
    n_T, n_classes, n_feat, batch = 400, 10, 128, 256

    ddpm = ref.DDPM(
        nn_model=ref.ContextUnet(in_channels=1, n_feat=n_feat,
                                 n_classes=n_classes),
        betas=(1e-4, 0.02), n_T=n_T, device=device, drop_prob=0.1)
    ddpm.to(device)
    opt = torch.optim.Adam(ddpm.parameters(), lr=1e-4)

    x = torch.rand(batch, 1, 28, 28)
    c = torch.randint(0, n_classes, (batch,))

    # ---- train steps (MNIST_script.py:338-349) --------------------------
    ddpm.train()
    n_warm, n_meas = 2, 10
    for i in range(n_warm + n_meas):
        if i == n_warm:
            t0 = time.time()
        opt.zero_grad()
        loss = ddpm(x, c)
        loss.backward()
        opt.step()
    train_s = (time.time() - t0) / n_meas
    train_steps_per_sec = 1.0 / train_s
    train_images_per_sec = batch / train_s

    # ---- 400-step CFG sampler (MNIST_script.py:254-298) -----------------
    ddpm.eval()
    n_sample = 4 * n_classes
    with torch.no_grad():
        t0 = time.time()
        x_gen, _ = ddpm.sample(n_sample, (1, 28, 28), device, guide_w=2.0)
        sample_s = time.time() - t0
    images_per_min = n_sample * 60.0 / sample_s

    out = {
        "config": "BASELINE config 1: MNIST conditional DDPM "
                  "(MNIST_script.py:303-394), torch CPU, MEASURED",
        "host": "1-core CPU (this image has no GPU)",
        "torch": torch.__version__,
        "batch": batch, "n_T": n_T,
        "train_steps_per_sec": round(train_steps_per_sec, 4),
        "train_images_per_sec": round(train_images_per_sec, 2),
        "sample_n": n_sample,
        "sample_seconds": round(sample_s, 1),
        "sample_images_per_min": round(images_per_min, 3),
        "loss_final": round(float(loss.item()), 4),
        "note": "synthetic MNIST-shaped batches (zero-egress: no dataset "
                "download); throughput is shape-dependent only",
    }
    path = "benchmarks/TORCH_BASELINE.json"
    try:  # merge: keep the flagship section if present
        with open(path) as f:
            doc = json.load(f)
    except FileNotFoundError:
        doc = {}
    doc.update(out)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--flagship" in sys.argv:
        sys.exit(flagship_baseline())
    sys.exit(main())
