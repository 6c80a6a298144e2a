"""
CLI tests mirroring the reference suite: audio_to_image_test,
image_to_audio_test, sample_clips_test, print_exif_test invariants.
"""

import numpy as np
import pytest
from PIL import Image

from riffusion_tpu import cli
from riffusion_tpu.audio.segment import AudioSegment
from riffusion_tpu.spectrogram_params import SpectrogramParams


@pytest.fixture()
def wav_path(tmp_path, mono_wave):
    path = tmp_path / "clip.wav"
    AudioSegment.from_float(mono_wave * 32767, 44100).export(path, format="wav")
    return path


@pytest.fixture()
def stereo_wav_path(tmp_path, stereo_wave):
    path = tmp_path / "clip_stereo.wav"
    AudioSegment.from_float(stereo_wave * 32767, 44100).export(path, format="wav")
    return path


def test_audio_to_image_mono(tmp_path, wav_path, test_device):
    image_path = tmp_path / "spec.png"
    cli.audio_to_image(audio=str(wav_path), image=str(image_path), device=test_device)
    assert image_path.exists()

    image = Image.open(image_path)
    assert image.mode == "RGB"
    # width = duration_ms / step_size_ms, height = num_frequencies
    assert image.size == (568, 512)

    arr = np.array(image)
    assert np.array_equal(arr[:, :, 0], arr[:, :, 1])
    assert np.array_equal(arr[:, :, 1], arr[:, :, 2])

    params = SpectrogramParams.from_exif(image.getexif())
    assert params == SpectrogramParams(sample_rate=44100, stereo=False)


def test_audio_to_image_stereo(tmp_path, stereo_wav_path, test_device):
    image_path = tmp_path / "spec.png"
    cli.audio_to_image(
        audio=str(stereo_wav_path), image=str(image_path), stereo=True, device=test_device
    )
    image = Image.open(image_path)
    arr = np.array(image)
    assert np.all(arr[:, :, 0] == 0)  # R channel all zero for stereo
    params = SpectrogramParams.from_exif(image.getexif())
    assert params.stereo is True


def test_image_to_audio_roundtrip(tmp_path, wav_path, test_device):
    image_path = tmp_path / "spec.png"
    audio_path = tmp_path / "out.wav"
    cli.audio_to_image(audio=str(wav_path), image=str(image_path), device=test_device)
    cli.image_to_audio(image=str(image_path), audio=str(audio_path), device=test_device)

    out = AudioSegment.from_file(audio_path)
    assert out.frame_rate == 44100
    assert out.channels == 1
    src = AudioSegment.from_file(wav_path)
    assert abs(out.duration_ms - src.duration_ms) < 10


def test_image_to_audio_no_exif_uses_defaults(tmp_path, test_device, capsys):
    image_path = tmp_path / "plain.png"
    Image.new("RGB", (128, 512), (128, 128, 128)).save(image_path)
    audio_path = tmp_path / "out.wav"
    cli.image_to_audio(image=str(image_path), audio=str(audio_path), device=test_device)
    assert "Using defaults" in capsys.readouterr().out
    assert audio_path.exists()


def test_sample_clips(tmp_path, wav_path):
    out_dir = tmp_path / "clips"
    cli.sample_clips(
        audio=str(wav_path),
        output_dir=str(out_dir),
        num_clips=3,
        duration_ms=1000,
        seed=7,
    )
    clips = sorted(out_dir.glob("*.wav"))
    assert len(clips) == 3
    for clip_path in clips:
        clip = AudioSegment.from_file(clip_path)
        assert abs(clip.duration_ms - 1000) < 2
        assert clip.channels == 1


def test_print_exif(tmp_path, wav_path, test_device, capsys):
    image_path = tmp_path / "spec.png"
    cli.audio_to_image(audio=str(wav_path), image=str(image_path), device=test_device)
    capsys.readouterr()
    cli.print_exif(image=str(image_path))
    out = capsys.readouterr().out
    assert "SAMPLE_RATE" in out
    assert "44100" in out
    assert "NUM_FREQUENCIES" in out


def test_audio_to_images_batch(tmp_path, wav_path, stereo_wav_path, test_device):
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    for i, src in enumerate([wav_path, stereo_wav_path]):
        (audio_dir / f"a{i}.wav").write_bytes(src.read_bytes())

    out_dir = tmp_path / "images"
    cli.audio_to_images_batch(
        audio_dir=str(audio_dir),
        output_dir=str(out_dir),
        image_extension="png",
        mono=True,
        device=test_device,
        num_threads=2,
    )
    images = sorted(out_dir.glob("*.png"))
    assert len(images) == 2
    for p in images:
        img = Image.open(p)
        assert img.size == (568, 512)


def test_sample_clips_batch(tmp_path, wav_path):
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    (audio_dir / "a.wav").write_bytes(wav_path.read_bytes())

    out_dir = tmp_path / "clips"
    cli.sample_clips_batch(
        audio_dir=str(audio_dir),
        output_dir=str(out_dir),
        num_clips_per_file=2,
        duration_ms=800,
        extension="wav",
        seed=3,
    )
    clips = sorted(out_dir.glob("*.wav"))
    assert len(clips) == 2


def test_main_dispatch(tmp_path, wav_path, test_device):
    image_path = tmp_path / "spec.png"
    cli.main(
        [
            "audio-to-image",
            "--audio",
            str(wav_path),
            "--image",
            str(image_path),
            "--device",
            test_device,
        ]
    )
    assert image_path.exists()


def test_main_rejects_unknown_flag(capsys):
    with pytest.raises(SystemExit):
        cli.main(["audio-to-image", "--nope", "x"])


@pytest.mark.slow  # multi-minute compile on 1 core; runs in the CI slow job
def test_text_to_audio_command(tmp_path):
    """CLI text-to-audio: one fused program -> wav (+ optional PNG)."""
    import wave

    import numpy as np

    from riffusion_tpu.cli import main

    audio = tmp_path / "out.wav"
    image = tmp_path / "out.png"
    main([
        "text-to-audio", "--prompt", "trance arps",
        "--audio", str(audio), "--image", str(image),
        "--num-inference-steps", "2", "--width", "64",
        "--checkpoint", "random:tiny", "--device", "cpu",
    ])
    assert audio.exists() and image.exists()
    with wave.open(str(audio)) as w:
        data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert np.abs(data).max() > 1000


@pytest.mark.slow  # multi-minute compile on 1 core; runs in the CI slow job
def test_stream_command(tmp_path, capsys):
    """CLI stream: overlapped (double-buffered) clip generation along the
    prompt-interpolation walk, crossfade-stitched into one track — the
    BASELINE.json 'real-time streaming' config as a user surface."""
    import wave

    import numpy as np
    from PIL import Image

    from riffusion_tpu.cli import main

    seed_path = tmp_path / "seed.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(seed_path)
    audio = tmp_path / "stream.wav"
    main([
        "stream", "--prompt-start", "lofi beat", "--prompt-end", "synthwave",
        "--audio", str(audio), "--num-clips", "4", "--batch", "2",
        "--num-inference-steps", "2", "--seed-image", str(seed_path),
        "--num-frequencies", "64", "--crossfade-ms", "50",
        "--checkpoint", "random:tiny", "--device", "cpu",
    ])
    assert audio.exists()
    with wave.open(str(audio)) as w:
        rate, n = w.getframerate(), w.getnframes()
        data = np.frombuffer(w.readframes(n), np.int16)
    assert rate == 44100
    # 4 clips of 63*hop samples each, 3 crossfades of 50 ms
    clip_s = 63 * 441 / 44100
    expect_s = 4 * clip_s - 3 * 0.050
    assert abs(n / rate - expect_s) < 0.1, (n / rate, expect_s)
    assert np.abs(data).max() > 1000
    assert "x realtime" in capsys.readouterr().out


@pytest.mark.slow  # multi-minute compile on 1 core; runs in the CI slow job
def test_finetune_command(tmp_path):
    """CLI finetune: builds the latent dataset from audio, trains 1 step,
    exports a loadable checkpoint (same tiny geometry as tests/test_finetune.py
    so the trainer program comes from the compile cache)."""
    import json

    import numpy as np

    from riffusion_tpu.audio.segment import AudioSegment
    from riffusion_tpu.cli import main

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    sr = 44100
    t = np.arange(int(sr * 1.5)) / sr
    for i in (0, 1):  # 2 files x 2 clips of 640 ms -> 4 clips
        wave_f = 0.4 * np.sin(2 * np.pi * (200 + 100 * i) * t)
        AudioSegment((wave_f * 32767).astype(np.int16), sr).export(
            str(audio_dir / f"song_{i}.wav"), format="wav"
        )
    out = tmp_path / "run"
    main([
        "finetune", "--checkpoint", "random:tiny",
        "--audio-dir", str(audio_dir), "--output-dir", str(out),
        "--prompt", "test tone", "--steps", "1", "--batch-size", "4",
        "--clip-duration-ms", "640", "--num-frequencies", "64",
        "--checkpoint-every", "10", "--device", "cpu",
    ])
    meta = json.loads((out / "dataset" / "meta.json").read_text())
    assert meta["num_clips"] == 4
    assert meta["prompts"] == ["test tone"]
    assert (out / "export" / "riffusion_tpu.json").exists()
