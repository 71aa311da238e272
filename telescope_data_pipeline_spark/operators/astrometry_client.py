"""Real astrometry.net (nova) HTTP client for the WCS-solve seam.

Reference ``get_wcs`` (core.py:486-529) drives astroquery's
``AstrometryNet.solve_from_source_list(x[:30], y[:30], 4096, 4096,
submission_id=..., solve_timeout=600)`` with a resume loop: a
``TimeoutError`` carries the submission id in ``args[1]`` and the next
attempt resumes monitoring that submission instead of re-uploading
(core.py:511-522). This module re-implements that protocol directly
against the PUBLIC nova.astrometry.net JSON API (the same endpoints
astroquery wraps):

- ``POST /api/login``             {"apikey"} → {"session"}
- ``POST /api/upload``            multipart: request-json + x/y source
                                  list as a text file → {"subid"}
- ``GET  /api/submissions/<sub>`` → {"jobs": [...]} (None until queued)
- ``GET  /api/jobs/<job>``        → {"status": "solving|success|failure"}
- ``GET  /api/jobs/<job>/calibration`` → {"ra", "dec", "pixscale", ...}

The transport is injectable (``http``) so unit tests exercise
timeout → resume → success against an in-memory fake with zero network;
production uses the bundled ``requests`` transport. The produced solver
callable plugs into the existing seam ``solve_wcs(detections, solver=)``
(operators/external.py) unchanged — the deterministic ``fake_solver``
remains the default for hermetic environments.
"""

from __future__ import annotations

import time
from collections.abc import Callable

__all__ = [
    "WCSTimeoutError",
    "AstrometryNetClient",
    "make_nova_solver",
]

#: transport signature: (method, url, data=None, files=None, timeout_s) -> dict
Transport = Callable[..., dict]


class WCSTimeoutError(TimeoutError):
    """Solve did not finish inside ``solve_timeout``. Mirrors the
    astroquery contract the reference's resume loop relies on
    (core.py:518-519): ``args[1]`` is the submission id to resume."""

    def __init__(self, message: str, submission_id: int | None):
        super().__init__(message, submission_id)
        self.submission_id = submission_id


def _requests_transport(method: str, url: str, data=None, files=None,
                        timeout_s: float = 30.0) -> dict:
    """Default production transport (requests). Raises on HTTP errors;
    returns the decoded JSON body."""
    import requests  # public PyPI package, bundled in this image

    if method == "GET":
        r = requests.get(url, timeout=timeout_s)
    else:
        r = requests.post(url, data=data, files=files, timeout=timeout_s)
    r.raise_for_status()
    return r.json()


class AstrometryNetClient:
    """Minimal source-list solver against the nova astrometry.net API.

    Parameters mirror the reference's configuration: ``image_width`` /
    ``image_height`` default 4096 (core.py:509-510), ``solve_timeout_s``
    defaults 600 (core.py:514). ``poll_interval_s`` is the submission/
    job polling cadence; tests drop it to 0.
    """

    def __init__(self, api_key: str,
                 base_url: str = "https://nova.astrometry.net/api",
                 image_width: int = 4096, image_height: int = 4096,
                 solve_timeout_s: float = 600.0,
                 poll_interval_s: float = 5.0,
                 http: Transport = _requests_transport,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep):
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.image_width = image_width
        self.image_height = image_height
        self.solve_timeout_s = solve_timeout_s
        self.poll_interval_s = poll_interval_s
        self._http = http
        self._clock = clock
        self._sleep = sleep
        self._session: str | None = None

    # -- protocol steps ----------------------------------------------------

    def login(self) -> str:
        """POST /api/login; caches the session key across submissions."""
        import json

        out = self._http("POST", f"{self.base_url}/login",
                         data={"request-json": json.dumps(
                             {"apikey": self.api_key})})
        if out.get("status") != "success":
            raise RuntimeError(f"astrometry.net login failed: {out}")
        self._session = out["session"]
        return self._session

    def submit_source_list(self, xs: list[float], ys: list[float]) -> int:
        """Upload an x/y source list (one ``x y`` pair per line — the
        text form astroquery sends) and return the submission id."""
        import json

        if self._session is None:
            self.login()
        body = "\n".join(f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys))
        out = self._http(
            "POST", f"{self.base_url}/upload",
            data={"request-json": json.dumps({
                "session": self._session,
                "image_width": self.image_width,
                "image_height": self.image_height,
            })},
            files={"file": ("sources.txt", body.encode())})
        if out.get("status") != "success":
            raise RuntimeError(f"astrometry.net upload failed: {out}")
        return int(out["subid"])

    def monitor_submission(self, submission_id: int) -> dict:
        """Poll until the submission's job succeeds, fails, or the
        600 s budget runs out — in which case :class:`WCSTimeoutError`
        carries ``submission_id`` so the caller resumes (the reference's
        ``monitor_submission`` path, core.py:520-521)."""
        deadline = self._clock() + self.solve_timeout_s
        job_id: int | None = None
        while self._clock() < deadline:
            if job_id is None:
                sub = self._http(
                    "GET", f"{self.base_url}/submissions/{submission_id}")
                jobs = [j for j in (sub.get("jobs") or []) if j]
                if jobs:
                    job_id = int(jobs[0])
                else:
                    self._sleep(self.poll_interval_s)
                    continue
            job = self._http("GET", f"{self.base_url}/jobs/{job_id}")
            status = job.get("status")
            if status == "success":
                return self._http(
                    "GET", f"{self.base_url}/jobs/{job_id}/calibration")
            if status == "failure":
                raise RuntimeError(
                    f"astrometry.net solve failed (job {job_id})")
            self._sleep(self.poll_interval_s)
        raise WCSTimeoutError(
            f"solve timed out after {self.solve_timeout_s}s", submission_id)

    # -- one-shot solve with resume -----------------------------------------

    def solve(self, xs: list[float], ys: list[float],
              submission_id: int | None = None) -> dict:
        """Reference core.py:511-522 verbatim semantics: submit unless
        resuming an existing submission, monitor with the 600 s budget,
        and on timeout RESUME (don't re-upload) until solved. Returns
        the solver-seam dict {crval_ra, crval_dec, pix_scale}."""
        while True:
            try:
                if submission_id is None:
                    submission_id = self.submit_source_list(xs, ys)
                cal = self.monitor_submission(submission_id)
            except WCSTimeoutError as e:
                submission_id = e.submission_id
                continue
            # nova calibration: ra/dec in deg, pixscale in arcsec/px
            return {"crval_ra": float(cal["ra"]),
                    "crval_dec": float(cal["dec"]),
                    "pix_scale": float(cal["pixscale"]) / 3600.0}


def make_nova_solver(api_key: str, **kwargs) -> Callable[[list, list], dict]:
    """Build a solver callable for ``solve_wcs(detections, solver=...)``
    backed by one shared client (one login session for all epochs).
    Extra kwargs flow to :class:`AstrometryNetClient` — including the
    injectable ``http`` transport used by the mocked-server tests."""
    client = AstrometryNetClient(api_key, **kwargs)

    def solver(xs: list[float], ys: list[float]) -> dict:
        return client.solve(xs, ys)

    return solver
