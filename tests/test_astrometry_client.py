"""Astrometry.net HTTP client (operators/astrometry_client.py): mocked
in-memory API server exercising the reference's resume protocol
(core.py:511-522) — timeout carries the submission id, the retry
monitors instead of re-uploading — plus the idempotent parquet cache
re-join (solve_wcs_cached)."""

from __future__ import annotations

import json

import pytest

from telescope_data_pipeline_spark.operators.astrometry_client import (
    AstrometryNetClient,
    WCSTimeoutError,
    make_nova_solver,
)

BASE = "https://nova.test/api"


class FakeNova:
    """Scripted nova API: login/upload/submissions/jobs/calibration.
    ``jobs_after`` controls how many submission polls return no job —
    large values force the 600s-budget timeout path."""

    def __init__(self, jobs_after: int = 0, job_status: str = "success",
                 solving_polls: int = 0):
        self.jobs_after = jobs_after
        self.job_status = job_status
        self.solving_polls = solving_polls
        self.calls: list[str] = []
        self.sub_polls = 0
        self.job_polls = 0

    def __call__(self, method: str, url: str, data=None, files=None,
                 timeout_s: float = 30.0) -> dict:
        path = url[len(BASE):]
        self.calls.append(f"{method} {path}")
        if path == "/login":
            assert json.loads(data["request-json"])["apikey"] == "k3y"
            return {"status": "success", "session": "sess-1"}
        if path == "/upload":
            req = json.loads(data["request-json"])
            assert req["session"] == "sess-1"
            assert req["image_width"] == 4096
            body = files["file"][1].decode()
            assert len(body.splitlines()) == 3  # the source list rides along
            return {"status": "success", "subid": 101}
        if path == "/submissions/101":
            self.sub_polls += 1
            if self.sub_polls <= self.jobs_after:
                return {"jobs": [None]}
            return {"jobs": [2222]}
        if path == "/jobs/2222":
            self.job_polls += 1
            if self.job_polls <= self.solving_polls:
                return {"status": "solving"}
            return {"status": self.job_status}
        if path == "/jobs/2222/calibration":
            return {"ra": 150.5, "dec": 2.25, "pixscale": 1.8,
                    "radius": 0.4, "parity": 1}
        raise AssertionError(f"unexpected call {method} {url}")


def make_client(fake: FakeNova, solve_timeout_s: float = 10.0):
    t = [0.0]
    return AstrometryNetClient(
        "k3y", base_url=BASE, solve_timeout_s=solve_timeout_s,
        poll_interval_s=1.0, http=fake,
        clock=lambda: t[0], sleep=lambda d: t.__setitem__(0, t[0] + d))


XS, YS = [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]


def test_solve_happy_path_parses_calibration():
    fake = FakeNova(solving_polls=2)
    out = make_client(fake).solve(XS, YS)
    assert out == {"crval_ra": 150.5, "crval_dec": 2.25,
                   "pix_scale": 1.8 / 3600.0}
    assert fake.calls[0] == "POST /login"
    assert fake.calls.count("POST /upload") == 1
    assert fake.job_polls == 3  # 2 solving + 1 success


def test_timeout_carries_submission_id():
    fake = FakeNova(jobs_after=10_000)
    client = make_client(fake, solve_timeout_s=5.0)
    sub = client.submit_source_list(XS, YS)
    with pytest.raises(WCSTimeoutError) as ei:
        client.monitor_submission(sub)
    assert ei.value.submission_id == 101
    assert ei.value.args[1] == 101  # the reference reads args[1]


def test_timeout_then_resume_does_not_reupload():
    # 6 no-job polls: the first monitor (5s budget / 1s polls) times
    # out; the resume loop must monitor submission 101 again WITHOUT a
    # second upload, then succeed.
    fake = FakeNova(jobs_after=6)
    out = make_client(fake, solve_timeout_s=5.0).solve(XS, YS)
    assert out["crval_ra"] == 150.5
    assert fake.calls.count("POST /upload") == 1
    assert fake.calls.count("GET /submissions/101") >= 6


def test_job_failure_raises():
    fake = FakeNova(job_status="failure")
    with pytest.raises(RuntimeError, match="solve failed"):
        make_client(fake).solve(XS, YS)


def test_solver_seam_signature():
    """make_nova_solver yields the (xs, ys) -> dict seam solve_wcs
    expects, sharing one login session across calls."""
    fake = FakeNova()
    solver = make_nova_solver("k3y", base_url=BASE, poll_interval_s=0.0,
                              http=fake)
    out = solver(XS, YS)
    assert set(out) == {"crval_ra", "crval_dec", "pix_scale"}
    solver(XS, YS)
    assert fake.calls.count("POST /login") == 1  # session reused


def test_solve_wcs_cached_idempotent(spark, tmp_path):
    """First run populates the cache; a second run with a DEAD solver
    must still return the cached epochs solved (no re-submission) and
    only hit the service for the new epoch."""
    from telescope_data_pipeline_spark.operators.external import (
        solve_wcs_cached,
    )

    cache = str(tmp_path / "wcs_cache")
    det1 = spark.createDataFrame(
        [(e, i, 10.0 * i, 5.0 * i, 100.0 - i) for e in (1, 2)
         for i in range(5)],
        "epoch_id int, id long, xcentroid double, ycentroid double, flux double")

    first = solve_wcs_cached(spark, det1, cache).toPandas()
    assert sorted(first.epoch_id) == [1, 2] and first.solved.all()

    def dead(xs, ys):
        raise ConnectionError("service down")

    det2 = det1.union(spark.createDataFrame(
        [(3, i, 7.0 * i, 3.0 * i, 50.0 - i) for i in range(5)],
        det1.schema))
    second = (solve_wcs_cached(spark, det2, cache, solver=dead,
                               max_attempts=1, base_backoff_s=0.0)
              .toPandas().set_index("epoch_id"))
    assert bool(second.loc[1].solved) and bool(second.loc[2].solved)
    assert not bool(second.loc[3].solved)  # new epoch failed, NOT cached

    # third run, service back: only epoch 3 is solved fresh
    third = (solve_wcs_cached(spark, det2, cache)
             .toPandas().set_index("epoch_id"))
    assert third.solved.all() and len(third) == 3
