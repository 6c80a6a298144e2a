"""Dynamic request batching (serving.DynamicBatcher): coalescing, grouping,
bucket padding, error propagation — against a fake pipeline (no device work)
— plus one live-socket test of the threaded server with batching enabled."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import PIL.Image
import pytest

from riffusion_tpu.datatypes import InferenceInput, PromptInput
from riffusion_tpu.serving import DynamicBatcher
from riffusion_tpu.spectrogram_params import SpectrogramParams


class FakePipeline:
    """Records batch sizes; returns distinguishable results per request."""

    def __init__(self, delay: float = 0.0, fail: bool = False):
        self.calls = []
        self.delay = delay
        self.fail = fail

    def _result(self, inputs):
        img = PIL.Image.new("RGB", (8, 8), color=(inputs.start.seed % 256, 0, 0))
        return img, f"segment-for-seed-{inputs.start.seed}"

    def riffuse_audio(self, inputs, init_image, mask_image=None, params=None,
                      apply_filters=True, scheduler=None):
        if self.fail:
            raise RuntimeError("device on fire")
        self.calls.append(1)
        self.schedulers = getattr(self, "schedulers", []) + [scheduler]
        time.sleep(self.delay)
        return self._result(inputs)

    def riffuse_audio_batch(self, inputs_list, init_image, params=None,
                            apply_filters=True, async_dispatch=False,
                            mask_image=None, scheduler=None):
        if self.fail:
            raise RuntimeError("device on fire")
        self.calls.append(len(inputs_list))
        self.schedulers = getattr(self, "schedulers", []) + [scheduler]
        self.steps_seen = getattr(self, "steps_seen", []) + [
            sorted({i.num_inference_steps for i in inputs_list})
        ]
        time.sleep(self.delay)
        results = [self._result(i) for i in inputs_list]
        if async_dispatch:
            return lambda: results  # exercise the pipelined finalize path
        return results


def _inp(seed: int, steps: int = 5, mask: str = "") -> InferenceInput:
    return InferenceInput(
        start=PromptInput(prompt="a", seed=seed),
        end=PromptInput(prompt="b", seed=seed + 1),
        alpha=0.5,
        num_inference_steps=steps,
        mask_image_id=mask or None,
    )


IMG = PIL.Image.new("RGB", (8, 8))
PARAMS = SpectrogramParams()


def _submit_many(batcher, reqs, mask_images=None):
    results = [None] * len(reqs)
    errors = [None] * len(reqs)

    def call(i):
        try:
            results[i] = batcher.submit(
                reqs[i], IMG, (mask_images or {}).get(i), PARAMS,
                seed_image_id="og_beat",
                mask_image_id=reqs[i].mask_image_id,
            )
        except BaseException as e:  # noqa: BLE001 - test captures
            errors[i] = e

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    return results, errors


def test_concurrent_requests_coalesce_into_one_batch():
    pipe = FakePipeline()
    batcher = DynamicBatcher(pipe, max_batch=8, window_ms=300)
    try:
        reqs = [_inp(seed=i) for i in range(4)]
        results, errors = _submit_many(batcher, reqs)
        assert all(e is None for e in errors)
        # each caller got ITS result back (not a neighbor's)
        for i, (img, seg) in enumerate(results):
            assert seg == f"segment-for-seed-{i}"
        # one batched launch, padded 4 -> bucket 4 (no padding needed)
        assert pipe.calls == [4]
        assert batcher.stats["launches"] == 1
        assert batcher.stats["batched_requests"] == 4
        assert batcher.stats["padded_slots"] == 0
        assert batcher.stats["pipelined_finalizes"] == 1
    finally:
        batcher.shutdown()


def test_bucket_padding():
    pipe = FakePipeline()
    batcher = DynamicBatcher(pipe, max_batch=8, window_ms=300, buckets=(1, 2, 4, 8))
    try:
        reqs = [_inp(seed=i) for i in range(3)]  # 3 -> bucket 4
        results, errors = _submit_many(batcher, reqs)
        assert all(e is None for e in errors)
        assert pipe.calls == [4]
        assert batcher.stats["padded_slots"] == 1
    finally:
        batcher.shutdown()


def test_mixed_signatures_grouped_separately():
    pipe = FakePipeline()
    batcher = DynamicBatcher(pipe, max_batch=8, window_ms=300)
    try:
        # two step counts -> two groups -> two launches
        reqs = [_inp(seed=0, steps=5), _inp(seed=1, steps=5),
                _inp(seed=2, steps=9), _inp(seed=3, steps=9)]
        results, errors = _submit_many(batcher, reqs)
        assert all(e is None for e in errors)
        assert sorted(pipe.calls) == [2, 2]
        for i, (img, seg) in enumerate(results):
            assert seg == f"segment-for-seed-{i}"
    finally:
        batcher.shutdown()


def test_masked_requests_batch_by_mask_id():
    """Masked requests with the SAME mask id share one batched launch (the
    batch program applies one shared mask); different mask ids split."""
    pipe = FakePipeline()
    batcher = DynamicBatcher(pipe, max_batch=8, window_ms=300)
    try:
        reqs = [_inp(seed=0, mask="mask_top_third"), _inp(seed=1, mask="mask_top_third"),
                _inp(seed=2, mask="mask_beat_lines")]
        masks = {i: PIL.Image.new("RGB", (8, 8)) for i in range(3)}
        results, errors = _submit_many(batcher, reqs, mask_images=masks)
        assert all(e is None for e in errors)
        # same-mask pair batches (one launch of 2); the odd mask runs single
        assert sorted(pipe.calls) == [1, 2]
    finally:
        batcher.shutdown()


def test_single_request_uses_single_program():
    pipe = FakePipeline()
    batcher = DynamicBatcher(pipe, max_batch=8, window_ms=50)
    try:
        img, seg = batcher.submit(_inp(seed=7), IMG, None, PARAMS,
                                  seed_image_id="og_beat", mask_image_id=None)
        assert seg == "segment-for-seed-7"
        assert pipe.calls == [1]
    finally:
        batcher.shutdown()


def test_errors_propagate_to_all_waiters_and_worker_survives():
    pipe = FakePipeline(fail=True)
    batcher = DynamicBatcher(pipe, max_batch=8, window_ms=200)
    try:
        reqs = [_inp(seed=i) for i in range(2)]
        results, errors = _submit_many(batcher, reqs)
        assert all(isinstance(e, RuntimeError) for e in errors)
        # worker still alive and serving after the failure
        pipe.fail = False
        img, seg = batcher.submit(_inp(seed=5), IMG, None, PARAMS,
                                  seed_image_id="og_beat", mask_image_id=None)
        assert seg == "segment-for-seed-5"
    finally:
        batcher.shutdown()


# ----------------------------------------------------------- live socket


@pytest.fixture(scope="module")
def batching_server(tmp_path_factory):
    """Threaded server with dynamic batching on the tiny random model.

    Uses a 64x64 og_beat seed (like tests/test_server.py) so the batched
    program compiles/executes at tiny geometry — with the real 512x512
    seed_images/ this one test cost ~37 s of the suite."""
    import numpy as np
    from PIL import Image as PILImage

    import riffusion_tpu.server as srv
    from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
    from riffusion_tpu.serving import DynamicBatcher

    seed_dir = tmp_path_factory.mktemp("seeds")
    rng = np.random.default_rng(0)
    PILImage.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        seed_dir / "og_beat.png"
    )
    srv.PIPELINE = RiffusionPipeline.load_checkpoint("random:tiny", device="cpu")
    server = srv.RiffusionThreadingServer(("127.0.0.1", 0), seed_images_dir=seed_dir)
    server.batcher = DynamicBatcher(srv.PIPELINE, max_batch=4, window_ms=400)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server, server.server_address[1]
    server.batcher.shutdown()
    server.shutdown()


def _post(port, body, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/run_inference/",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def test_live_concurrent_requests_batched(batching_server):
    server, port = batching_server
    body = {
        "start": {"prompt": "piano", "seed": 1},
        "end": {"prompt": "piano", "seed": 2},
        "alpha": 0.0,
        "num_inference_steps": 2,
        "seed_image_id": "og_beat",
    }
    # warm the single path (compiles the n=2-bucket lazily below)
    outs = [None, None]

    def call(i):
        b = dict(body)
        b["start"] = {"prompt": "piano", "seed": 1 + i}
        outs[i] = _post(port, b)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)

    for status, payload in outs:
        assert status == 200
        assert payload["image"].startswith("data:image/jpeg;base64,")
        assert payload["audio"].startswith("data:audio/")
        # 64x64 seed -> ~0.6 s clip (duration scales with spectrogram width)
        assert payload["duration_s"] > 0.3
    stats = server.batcher.stats
    assert stats["requests"] >= 2
    # the two concurrent requests shared one device launch
    assert stats["batched_requests"] >= 2
    assert stats["launches"] < stats["requests"]


def test_fast_preset_overrides_steps_and_scheduler():
    """The serving FAST preset (serving.FAST_PRESET) rewrites every request
    to the preset step count and threads the preset scheduler through to the
    batched program — requests with different client-side step counts land
    in ONE group."""
    from riffusion_tpu.serving import FAST_PRESET

    pipe = FakePipeline()
    batcher = DynamicBatcher(
        pipe, max_batch=8, window_ms=300,
        scheduler=FAST_PRESET["scheduler"], steps_override=FAST_PRESET["steps"],
    )
    try:
        reqs = [_inp(seed=i, steps=10 * (i + 1)) for i in range(3)]  # 10/20/30
        results, errors = _submit_many(batcher, reqs)
        assert all(e is None for e in errors)
        assert pipe.calls == [4]  # one launch, bucket-padded 3 -> 4
        assert pipe.schedulers == [FAST_PRESET["scheduler"]]
        assert pipe.steps_seen == [[FAST_PRESET["steps"]]]
    finally:
        batcher.shutdown()


def test_strength_gated_preset_selects_per_request():
    """strength_gated=True: requests at the gated strength (0.75, the
    request default) run FAST_PRESET; off-gate strengths run the robust
    FAST_PRESET_OFFGATE — and the two never share a batch group."""
    import dataclasses

    from riffusion_tpu.serving import FAST_PRESET, FAST_PRESET_OFFGATE

    pipe = FakePipeline()
    batcher = DynamicBatcher(
        pipe, max_batch=8, window_ms=300,
        scheduler=FAST_PRESET["scheduler"], steps_override=FAST_PRESET["steps"],
        strength_gated=True,
    )
    try:
        on_gate = [_inp(seed=i, steps=50) for i in range(2)]  # denoising 0.75
        off_gate = []
        for seed in (9, 10):
            off = _inp(seed=seed, steps=50)
            off_gate.append(dataclasses.replace(
                off,
                start=dataclasses.replace(off.start, denoising=0.6),
                end=dataclasses.replace(off.end, denoising=0.6),
            ))
        results, errors = _submit_many(batcher, on_gate + off_gate)
        assert all(e is None for e in errors)
        # two separate device groups, one per strength bucket
        assert sorted(pipe.calls) == [2, 2]
        flat_steps = sorted(s for grp in pipe.steps_seen for s in grp)
        assert flat_steps == sorted(
            [FAST_PRESET["steps"], FAST_PRESET_OFFGATE["steps"]]
        )
        assert sorted(pipe.schedulers) == sorted(
            [FAST_PRESET["scheduler"], FAST_PRESET_OFFGATE["scheduler"]]
        )
    finally:
        batcher.shutdown()


def test_offgate_preset_is_gate_qualified():
    """The off-gate fallback must itself be inside-band in the newest
    committed gate (it serves every request off the gated strength)."""
    import json
    from pathlib import Path

    from riffusion_tpu.serving import FAST_PRESET_OFFGATE

    gates = sorted(Path(__file__).parent.parent.glob("benchmarks/img2img_gate_*.json"))
    rows = json.loads(gates[-1].read_text())
    match = [
        r for r in rows
        if r["scheduler"] == FAST_PRESET_OFFGATE["scheduler"]
        and r["steps"] == FAST_PRESET_OFFGATE["steps"]
    ]
    assert match and match[0]["inside_50_step_band"], match


def test_fast_preset_is_gate_qualified():
    """Structural preset<->gate consistency: serving.FAST_PRESET must appear
    in the NEWEST committed img2img gate artifact
    (benchmarks/img2img_gate_*.json, written by sampler_agreement.py --mode
    img2img) with inside_50_step_band=true. A preset change that ships
    without a fresh measured gate row fails here — the published quality
    claim can never silently diverge from what the server runs."""
    import json
    from pathlib import Path

    from riffusion_tpu.serving import FAST_PRESET

    gates = sorted(Path(__file__).parent.parent.glob("benchmarks/img2img_gate_*.json"))
    assert gates, "no committed img2img gate artifact"
    rows = json.loads(gates[-1].read_text())
    match = [
        r for r in rows
        if r["scheduler"] == FAST_PRESET["scheduler"]
        and r["steps"] == FAST_PRESET["steps"]
    ]
    assert match, (
        f"FAST_PRESET {FAST_PRESET} has no row in {gates[-1].name}; re-run "
        "benchmarks/sampler_agreement.py --mode img2img and commit the JSON"
    )
    assert match[0]["inside_50_step_band"], (
        f"FAST_PRESET {FAST_PRESET} is OUTSIDE the 50-step band in "
        f"{gates[-1].name}: {match[0]}"
    )
