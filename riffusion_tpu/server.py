"""
JSON inference server (same HTTP surface as the reference's Flask app,
reference riffusion/server.py:39-189: POST /run_inference/ with an
InferenceInput body, 400 on malformed input or unknown seed/mask ids,
InferenceOutput JSON response with data-URI image + audio, CORS headers,
request logging to stdout + server.log).

Built on the stdlib http.server (single-threaded like the reference's
`threaded=False` Flask). The heavy path uses the pipeline's fused
`riffuse_audio` program, so the spectrogram never round-trips through PIL
between the UNet and Griffin-Lim. Audio is MP3 when an ffmpeg binary exists,
otherwise WAV (this image has no MP3 codec; the mime type reflects it).
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import logging
import os
import threading
import time
import typing as T
from http.server import BaseHTTPRequestHandler, HTTPServer
from socketserver import ThreadingMixIn
from pathlib import Path

import PIL.Image

from riffusion_tpu.audio.segment import _ffmpeg_path
from riffusion_tpu.datatypes import InferenceInput, InferenceOutput
from riffusion_tpu.riffusion_pipeline import RiffusionPipeline
from riffusion_tpu.spectrogram_params import SpectrogramParams
from riffusion_tpu.util import base64_util
from riffusion_tpu.util.dataclass_util import DecodeError, from_dict

# Global pipeline (single-model server, as in the reference)
PIPELINE: T.Optional[RiffusionPipeline] = None

SEED_IMAGES_DIR = Path(Path(__file__).resolve().parent.parent, "seed_images")

logger = logging.getLogger("riffusion_tpu.server")


def _encode_output(image: PIL.Image.Image, segment) -> dict:
    """Encode one (image, segment) result as an InferenceOutput dict."""
    audio_bytes = io.BytesIO()
    if _ffmpeg_path() is not None:
        segment.export(audio_bytes, format="mp3")
        audio_mime = "audio/mpeg"
    else:
        segment.export(audio_bytes, format="wav")
        audio_mime = "audio/wav"

    image_bytes = io.BytesIO()
    image.save(image_bytes, exif=image.getexif(), format="JPEG")
    image_bytes.seek(0)

    return dataclasses.asdict(InferenceOutput(
        image="data:image/jpeg;base64," + base64_util.encode(image_bytes),
        audio=f"data:{audio_mime};base64," + base64_util.encode(audio_bytes),
        duration_s=segment.duration_seconds,
    ))


def compute_request(
    inputs: InferenceInput,
    pipeline: RiffusionPipeline,
    seed_images_dir: T.Union[str, Path],
    batcher=None,
) -> T.Union[str, T.Tuple[str, int]]:
    """Run one inference request; returns JSON string or (error, status).

    With `batcher` set (a serving.DynamicBatcher), the request joins the
    shared coalescing queue so concurrent requests run as one batched device
    program; otherwise it calls the pipeline directly (reference behavior)."""
    init_image_path = Path(seed_images_dir, f"{inputs.seed_image_id}.png")
    if not init_image_path.is_file():
        return f"Invalid seed image: {inputs.seed_image_id}", 400
    init_image = PIL.Image.open(str(init_image_path)).convert("RGB")

    mask_image: T.Optional[PIL.Image.Image] = None
    if inputs.mask_image_id:
        mask_image_path = Path(seed_images_dir, f"{inputs.mask_image_id}.png")
        if not mask_image_path.is_file():
            return f"Invalid mask image: {inputs.mask_image_id}", 400
        mask_image = PIL.Image.open(str(mask_image_path)).convert("RGB")

    # Mel-bin count must equal the generated image height (512 for the
    # standard seed images; derived so smaller test models work too).
    num_frequencies = init_image.height - init_image.height % 32
    params = SpectrogramParams(
        min_frequency=0, max_frequency=10000, num_frequencies=num_frequencies
    )

    if batcher is not None:
        image, segment = batcher.submit(
            inputs, init_image, mask_image, params,
            seed_image_id=inputs.seed_image_id,
            mask_image_id=inputs.mask_image_id,
        )
    else:
        # Fused device program: UNet denoise -> VAE decode -> codec ->
        # inverse mel -> Griffin-Lim in one jit (the reference did image ->
        # PIL -> audio in two stages, server.py:145-163).
        image, segment = pipeline.riffuse_audio(
            inputs,
            init_image=init_image,
            mask_image=mask_image,
            params=params,
            apply_filters=True,
        )

    return json.dumps(_encode_output(image, segment))


def compute_batch_request(
    inputs_list: T.List[InferenceInput],
    pipeline: RiffusionPipeline,
    seed_images_dir: T.Union[str, Path],
) -> T.Union[str, T.Tuple[str, int]]:
    """Run N requests as one batched device program; returns
    {"outputs": [InferenceOutput, ...]} JSON. A shared mask_image_id is
    supported (the batch program applies one mask to every request; mixed
    ids are rejected by the route)."""
    seed_id = inputs_list[0].seed_image_id
    init_image_path = Path(seed_images_dir, f"{seed_id}.png")
    if not init_image_path.is_file():
        return f"Invalid seed image: {seed_id}", 400
    init_image = PIL.Image.open(str(init_image_path)).convert("RGB")

    mask_image: T.Optional[PIL.Image.Image] = None
    mask_id = inputs_list[0].mask_image_id
    if mask_id:
        mask_image_path = Path(seed_images_dir, f"{mask_id}.png")
        if not mask_image_path.is_file():
            return f"Invalid mask image: {mask_id}", 400
        mask_image = PIL.Image.open(str(mask_image_path)).convert("RGB")

    num_frequencies = init_image.height - init_image.height % 32
    params = SpectrogramParams(
        min_frequency=0, max_frequency=10000, num_frequencies=num_frequencies
    )
    try:
        results = pipeline.riffuse_audio_batch(
            inputs_list, init_image, params=params, mask_image=mask_image
        )
    except ValueError as exception:  # e.g. heterogeneous denoising strengths
        return str(exception), 400

    return json.dumps(
        {"outputs": [_encode_output(image, segment) for image, segment in results]}
    )


class _Handler(BaseHTTPRequestHandler):
    """Single route: POST /run_inference/ (plus OPTIONS for CORS preflight)."""

    server_version = "riffusion_tpu"

    def _send(self, status: int, body: bytes, content_type: str = "application/json"):
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Access-Control-Allow-Headers", "Content-Type")
        self.send_header("Access-Control-Allow-Methods", "POST, OPTIONS")
        self.end_headers()
        self.wfile.write(body)

    def do_OPTIONS(self):  # noqa: N802 - http.server naming
        self._send(204, b"")

    def do_GET(self):  # noqa: N802
        """Observability endpoints (no reference equivalent): /health for
        load balancers, /stats for request/batching counters."""
        route = self.path.rstrip("/")
        if route == "/health":
            body = {"status": "ok", "model_loaded": PIPELINE is not None}
            self._send(200, json.dumps(body).encode())
        elif route == "/stats":
            stats = dict(getattr(self.server, "request_stats", {}))
            batcher = getattr(self.server, "batcher", None)
            if batcher is not None:
                stats["batching"] = dict(batcher.stats)
            self._send(200, json.dumps(stats).encode())
        else:
            self._send(404, b"Not found", "text/plain")

    def do_POST(self):  # noqa: N802
        route = self.path.rstrip("/")
        if route not in ("/run_inference", "/run_inference_batch"):
            self._send(404, b"Not found", "text/plain")
            return
        start_time = time.time()
        length = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(length)

        try:
            json_data = json.loads(data)
        except json.JSONDecodeError as exception:
            self._send(400, str(exception).encode(), "text/plain")
            return

        logger.info(json_data)
        if route == "/run_inference_batch":
            result = self._handle_batch(json_data)
        else:
            try:
                inputs = from_dict(InferenceInput, json_data)
            except DecodeError as exception:
                logger.info(json_data)
                self._send(400, str(exception).encode(), "text/plain")
                return
            result = compute_request(
                inputs=inputs,
                seed_images_dir=self.server.seed_images_dir,  # type: ignore[attr-defined]
                pipeline=PIPELINE,
                batcher=getattr(self.server, "batcher", None),
            )
        elapsed = time.time() - start_time
        logger.info(f"Request took {elapsed:.2f} s")
        with self.server.stats_lock:  # type: ignore[attr-defined]
            stats = self.server.request_stats  # type: ignore[attr-defined]
            stats["requests"] = stats.get("requests", 0) + 1
            stats["total_seconds"] = round(stats.get("total_seconds", 0.0) + elapsed, 3)

        if isinstance(result, tuple):
            body, status = result
            self._send(status, body.encode(), "text/plain")
        else:
            self._send(200, result.encode())

    def _handle_batch(self, json_data) -> T.Union[str, T.Tuple[str, int]]:
        """POST /run_inference_batch/: {"requests": [InferenceInput, ...]}.
        All requests must share num_inference_steps, seed_image_id,
        mask_image_id (one shared mask — or none — per batch; the compiled
        batch program applies a single mask), and denoising strength; they
        run as ONE batched device program (throughput extension — no
        reference equivalent; reference mask handling: server.py:137-142)."""
        if not isinstance(json_data, dict) or "requests" not in json_data:
            return 'expected {"requests": [...]}', 400
        try:
            inputs_list = [from_dict(InferenceInput, r) for r in json_data["requests"]]
        except DecodeError as exception:
            return str(exception), 400
        if not inputs_list:
            return "empty batch", 400
        if len({i.seed_image_id for i in inputs_list}) != 1:
            return "batch requires a single seed_image_id", 400
        if len({i.num_inference_steps for i in inputs_list}) != 1:
            return "batch requires a single num_inference_steps", 400
        if len({i.mask_image_id or "" for i in inputs_list}) != 1:
            return "batch requires a single shared mask_image_id (or none)", 400

        return compute_batch_request(
            inputs_list,
            pipeline=PIPELINE,
            seed_images_dir=self.server.seed_images_dir,  # type: ignore[attr-defined]
        )

    def log_message(self, fmt, *args):  # route http.server chatter to logging
        logger.info("%s - %s", self.address_string(), fmt % args)


class RiffusionServer(HTTPServer):
    """HTTPServer carrying the seed-image directory config (single-threaded,
    the reference's serving model)."""

    def __init__(self, addr, seed_images_dir: T.Union[str, Path] = SEED_IMAGES_DIR):
        super().__init__(addr, _Handler)
        self.seed_images_dir = seed_images_dir
        self.batcher = None
        self.request_stats: T.Dict[str, T.Any] = {}
        self.stats_lock = threading.Lock()  # handler threads under ThreadingMixIn


class RiffusionThreadingServer(ThreadingMixIn, RiffusionServer):
    """Thread-per-connection front for dynamic batching: HTTP threads only
    parse/encode; a single batcher worker owns the device (serving.py)."""

    daemon_threads = True


def run_app(
    *,
    checkpoint: str = "riffusion/riffusion-model-v1",
    no_traced_unet: bool = False,
    device: str = "tpu",
    host: str = "127.0.0.1",
    port: int = 3013,
    debug: bool = False,
    ssl_certificate: T.Optional[str] = None,
    ssl_key: T.Optional[str] = None,
    seed_images_dir: T.Union[str, Path] = SEED_IMAGES_DIR,
    scheduler: T.Optional[str] = None,
    warmup: bool = False,
    warmup_steps: int = 50,
    dynamic_batching: bool = False,
    batch_window_ms: float = 150.0,
    max_batch: int = 8,
    serving_preset: str = "fast",
):
    """Start the inference server (reference-compatible signature).

    With dynamic_batching=True, concurrent /run_inference/ requests are
    coalesced into one batched device program (serving.DynamicBatcher) —
    aggregate throughput instead of the reference's one-at-a-time model.
    serving_preset (batching only): "fast" runs requests at the gated
    few-step FAST preset (serving.FAST_PRESET — inside the 50-step band on
    the img2img serving-shape gate, benchmarks/sampler_agreement.py --mode
    img2img), strength-gated so requests off the gate's denoising strength
    fall back to the robust serving.FAST_PRESET_OFFGATE; "parity" honors
    each request's scheduler/steps verbatim."""
    logging.basicConfig(level=logging.INFO)
    logging.getLogger().addHandler(logging.FileHandler("server.log"))

    global PIPELINE
    # A serving boot wants every stored riffuse executable (singles + batch
    # buckets) loading in the background while the model loads (aot.py).
    os.environ.setdefault("RIFFUSION_TPU_AOT_PREFETCH", "riffuse")
    PIPELINE = RiffusionPipeline.load_checkpoint(
        checkpoint=checkpoint,
        use_traced_unet=not no_traced_unet,
        device=device,
        scheduler=scheduler,
    )

    if warmup:
        # Pre-compile the standard request shape (512x512 seed, 50 steps,
        # default denoising) so the first real request is fast. Compiled
        # programs persist via the on-disk compilation cache.
        import numpy as np
        from PIL import Image as PILImage

        from riffusion_tpu.datatypes import PromptInput

        logger.info("warmup: compiling the standard request program...")
        seed_path = Path(seed_images_dir) / "og_beat.png"
        if seed_path.exists():
            init = PILImage.open(seed_path).convert("RGB")
        else:
            init = PILImage.fromarray(
                np.full((512, 512, 3), 128, np.uint8), mode="RGB"
            )
        h = init.height - init.height % 32
        params = SpectrogramParams(
            min_frequency=0, max_frequency=10000, num_frequencies=h
        )
        PIPELINE.riffuse_audio(
            InferenceInput(
                start=PromptInput(prompt="warmup", seed=0),
                end=PromptInput(prompt="warmup", seed=1),
                alpha=0.5,
                num_inference_steps=warmup_steps,
            ),
            init_image=init,
            params=params,
        )
        if dynamic_batching:
            # with batching on, concurrent traffic lands on the bucketed
            # batch programs — pre-compile those shapes too so the first
            # burst is fast (compiles persist via the on-disk cache)
            from riffusion_tpu.serving import FAST_PRESET

            fast = serving_preset == "fast"
            batch_steps = FAST_PRESET["steps"] if fast else warmup_steps
            batch_sched = FAST_PRESET["scheduler"] if fast else None
            for size in (2, 4, 8, 16):
                if size > max_batch:
                    break
                logger.info(f"warmup: compiling the batch-{size} program...")
                reqs = [
                    InferenceInput(
                        start=PromptInput(prompt="warmup", seed=i),
                        end=PromptInput(prompt="warmup", seed=100 + i),
                        alpha=0.5,
                        num_inference_steps=batch_steps,
                    )
                    for i in range(size)
                ]
                PIPELINE.riffuse_audio_batch(
                    reqs, init, params=params, scheduler=batch_sched
                )
        logger.info("warmup complete")

    if dynamic_batching:
        from riffusion_tpu.serving import FAST_PRESET, DynamicBatcher

        preset_kwargs = (
            # strength_gated: requests off the gated strength (0.75, the
            # request default) run FAST_PRESET_OFFGATE instead — those hit
            # first-compile (the warmup below only compiles the gated-path
            # programs; the XLA disk cache + AOT store amortize the rest)
            dict(scheduler=FAST_PRESET["scheduler"],
                 steps_override=FAST_PRESET["steps"], strength_gated=True)
            if serving_preset == "fast"
            else {}
        )
        server = RiffusionThreadingServer((host, port), seed_images_dir=seed_images_dir)
        server.batcher = DynamicBatcher(
            PIPELINE, max_batch=max_batch, window_ms=batch_window_ms, **preset_kwargs
        )
        logger.info(
            f"dynamic batching on (window {batch_window_ms} ms, max {max_batch}, "
            f"preset {serving_preset})"
        )
    else:
        server = RiffusionServer((host, port), seed_images_dir=seed_images_dir)
    if ssl_certificate:
        import ssl

        assert ssl_key is not None
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(ssl_certificate, ssl_key)
        server.socket = ctx.wrap_socket(server.socket, server_side=True)

    logger.info(f"Serving on http://{host}:{port} (checkpoint={checkpoint})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.server_close()


def main(argv: T.Optional[T.Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="riffusion_tpu inference server")
    parser.add_argument("--checkpoint", default="riffusion/riffusion-model-v1")
    parser.add_argument("--no-traced-unet", action="store_true")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=3013)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--ssl-certificate", default=None)
    parser.add_argument("--ssl-key", default=None)
    parser.add_argument("--seed-images-dir", default=str(SEED_IMAGES_DIR))
    parser.add_argument("--scheduler", default=None)
    parser.add_argument("--warmup", action="store_true",
                        help="pre-compile the standard request shape at startup")
    parser.add_argument("--warmup-steps", type=int, default=50)
    parser.add_argument("--dynamic-batching", action="store_true",
                        help="coalesce concurrent requests into batched device programs")
    parser.add_argument("--batch-window-ms", type=float, default=150.0)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--serving-preset", choices=("fast", "parity"), default="fast",
                        help="with --dynamic-batching: 'fast' runs requests at "
                             "the FAST preset (50-step quality at ~3x throughput, "
                             "serving.FAST_PRESET); "
                             "'parity' honors each request's steps/scheduler")
    args = parser.parse_args(argv)
    run_app(
        checkpoint=args.checkpoint,
        no_traced_unet=args.no_traced_unet,
        device=args.device,
        host=args.host,
        port=args.port,
        debug=args.debug,
        ssl_certificate=args.ssl_certificate,
        ssl_key=args.ssl_key,
        seed_images_dir=args.seed_images_dir,
        scheduler=args.scheduler,
        warmup=args.warmup,
        warmup_steps=args.warmup_steps,
        dynamic_batching=args.dynamic_batching,
        batch_window_ms=args.batch_window_ms,
        max_batch=args.max_batch,
        serving_preset=args.serving_preset,
    )


if __name__ == "__main__":
    main()
