"""Utility tests: throughput meter, platform env hook, prefetch reuse."""

import time

from vlm_tpu.utils.profiling import ThroughputMeter


class TestThroughputMeter:
    def test_skips_first_batch(self):
        m = ThroughputMeter()
        m.update(100)              # compile-dominated batch: excluded
        time.sleep(0.05)
        m.update(10)
        assert 0 < m.items_per_sec < 10_000
        assert m.wall_items_per_sec > 0
        # steady counts only post-warmup items
        assert m._count == 10 and m._total_count == 110

    def test_zero_before_updates(self):
        m = ThroughputMeter()
        assert m.items_per_sec == 0.0

    def test_report_prints(self, capsys):
        m = ThroughputMeter(skip_first=False)
        m.update(5)
        m.report("x")
        assert "[THROUGHPUT] x:" in capsys.readouterr().out


class TestPlatformEnv:
    def test_host_devices_env(self, monkeypatch):
        from vlm_tpu.utils import platform as plat
        monkeypatch.setenv("VLM_TPU_HOST_DEVICES", "4")
        monkeypatch.setenv("XLA_FLAGS", "")
        monkeypatch.delenv("VLM_TPU_PLATFORM", raising=False)
        plat.apply_platform_env()
        import os
        assert "--xla_force_host_platform_device_count=4" in \
            os.environ["XLA_FLAGS"]

    def test_platform_cpu_sets_interpret(self, monkeypatch):
        from vlm_tpu.utils import platform as plat
        monkeypatch.setenv("VLM_TPU_PLATFORM", "cpu")
        monkeypatch.delenv("VLM_TPU_PALLAS_INTERPRET", raising=False)
        plat.apply_platform_env()
        import os
        assert os.environ["VLM_TPU_PALLAS_INTERPRET"] == "1"
