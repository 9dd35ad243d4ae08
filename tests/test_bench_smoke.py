"""bench.py plumbing smoke: the driver scores the round by running this
script, so its DP placement / sync / JSON-line logic must not rot. Tiny
arch (WFL_BENCH_TINY) on the 8-device CPU mesh; the RTFx value itself is
meaningless here — only the mechanics are under test."""

import json

import pytest


def test_bench_dp_smoke(monkeypatch, capsys):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU platform")
    monkeypatch.setenv("WFL_BENCH_TINY", "1")
    monkeypatch.setenv("WFL_BENCH_DP", "1")
    monkeypatch.setenv("WFL_BENCH_BATCH", "8")
    monkeypatch.setenv("WFL_BENCH_ITERS", "1")
    monkeypatch.setenv("WFL_BENCH_CHUNK_S", "0.5")
    monkeypatch.setenv("WFL_BENCH_DTYPE", "f32")

    import bench
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    result = json.loads(out[-1])
    assert result["unit"] == "audio_sec/sec/chip"
    assert result["value"] > 0
    assert "vs_baseline" in result


def test_bench_dp_rejects_indivisible_batch(monkeypatch, capsys):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU platform")
    monkeypatch.setenv("WFL_BENCH_TINY", "1")
    monkeypatch.setenv("WFL_BENCH_DP", "1")
    monkeypatch.setenv("WFL_BENCH_BATCH", "6")  # not divisible by 8
    monkeypatch.setenv("WFL_BENCH_CHUNK_S", "0.5")

    import bench
    with pytest.raises(SystemExit, match="divide"):
        bench.main()
