"""Pins for bench.py's storm-proofing machinery (VERDICT r11 #1): the
per-query quiet gate, the committed-quiet-reference yardstick, and the
round inference behind the self-contained BENCH_r{N}_full.json. These are
pure-Python (no Spark session) — the timed loop itself is exercised by the
per-round bench runs."""

import json

import bench


class TestQuietReference:
    def test_reference_loads_for_matching_sf(self):
        ref = bench._load_quiet_reference("0.1")
        # the committed r11 quiet record: 59 medians, all positive floats
        assert len(ref) >= 59
        assert all(isinstance(v, float) and v > 0 for v in ref.values())
        assert "x3_minhash_lsh" in ref

    def test_reference_empty_on_sf_mismatch(self):
        # a yardstick from another scale factor would mislabel every scan-
        # bound query as regressed — it must simply not apply
        assert bench._load_quiet_reference("0.001") == {}

    def test_reference_file_tracks_its_sf(self):
        with open(bench._repo_root() + "/BENCH_QUIET_REFERENCE.json") as f:
            ref = json.load(f)
        assert str(ref["sf"]) == "0.1"
        assert set(ref) >= {"sf", "queries", "source"}

    def test_retake_threshold_arithmetic(self):
        # the retake trigger is med > 1.5*ref + 0.25: the floor keeps
        # sub-second queries from flapping on scheduler jitter while a
        # genuine 2x regression on a 2 s query always trips
        ref = 0.3
        assert not (0.69 > 1.5 * ref + 0.25)  # 2.3x on a 0.3 s query: jitter
        assert 4.0 > 1.5 * 2.0 + 0.25  # 2x on a 2 s query: trips


class TestRoundInference:
    def test_infer_round_is_latest_correctness_plus_one(self):
        # CORRECTNESS_r{N}.json is written by the driver at the END of
        # round N, so during the build the newest file is last round's
        rnd = bench._infer_round()
        assert isinstance(rnd, int) and rnd >= 12


class TestHeadlineRegistry:
    def test_headline_names_resolve(self):
        import __spark_entry__ as e

        known = set(e.queries()) | set(e.bench_only_queries())
        missing = [n for n in bench.HEADLINE if n not in known]
        assert not missing, f"HEADLINE entries without a query fn: {missing}"

    def test_reference_covers_headline(self):
        # every headline query should have a committed-quiet yardstick once
        # a quiet record lands; allow new-this-round entries to lag by one
        # round but not silently forever (cap the uncovered set)
        ref = bench._load_quiet_reference("0.1")
        uncovered = [n for n in bench.HEADLINE if n not in ref]
        assert len(uncovered) <= 5, (
            f"too many headline queries without a quiet-reference entry "
            f"(update BENCH_QUIET_REFERENCE.json from the next committed "
            f"quiet record): {uncovered}"
        )


class TestExternalLoadMeter:
    def test_self_load_is_excluded(self):
        # the property the meter exists for: CPU burned by THIS process
        # tree (python + descendants, i.e. the Spark JVM in a real run)
        # must not register as external — the first storm-proofed bench
        # run gated on raw loadavg and fired on its own 32-thread queries
        import multiprocessing as mp
        import time

        meter = bench.ExternalLoadMeter()
        time.sleep(1.0)
        idle = meter.external_cores()

        def spin(seconds):
            end = time.monotonic() + seconds
            while time.monotonic() < end:
                pass

        procs = [mp.Process(target=spin, args=(2.0,)) for _ in range(4)]
        for p in procs:
            p.start()
        time.sleep(2.0)
        busy_self = meter.external_cores()
        for p in procs:
            p.join()
        # 4 in-tree cores spinning must look (almost) idle externally;
        # allow slack for unrelated system daemons
        assert busy_self < 1.5, (idle, busy_self)

    def test_meter_monotonic_window_semantics(self):
        import time

        meter = bench.ExternalLoadMeter()
        time.sleep(0.2)
        a = meter.external_cores()
        b = meter.external_cores()  # near-zero window, must not blow up
        assert a >= 0.0 and b >= 0.0
