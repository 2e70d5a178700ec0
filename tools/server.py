#!/usr/bin/env python3
"""NutchServer-equivalent REST job-control service (the last
VERDICT-r02 "missing" item, #1).

Mirrors the reference's service layer
(``src/java/org/apache/nutch/service/``):

- ``NutchServer.java``: the embedded HTTP server (theirs CXF/JAX-RS,
  ours stdlib ``ThreadingHTTPServer`` — no new dependencies).
- ``resources/JobResource.java``: ``GET /job``, ``GET /job/{id}``,
  ``GET /job/{id}/stop``, ``GET /job/{id}/abort``,
  ``POST /job/create`` with JobConfig ``{type, confId, crawlId,
  args}`` — job types INJECT GENERATE FETCH PARSE UPDATEDB INDEX
  READDB INVERTLINKS DEDUP (``JobManager.JobType``; CLASS is rejected:
  arbitrary-class loading is a JVM concept and a remote-code hole).
- ``impl/JobWorker.java``: job ids ``[crawlId-]confId-TYPE-<hash>``,
  state machine IDLE RUNNING FINISHED FAILED KILLED (:54-90), each job
  on its own worker thread.
- ``resources/ConfigResource.java``: ``GET /config``,
  ``GET /config/{id}``, ``GET /config/{id}/{prop}``,
  ``POST /config/{id}``, ``DELETE /config/{id}`` over an in-memory
  ConfManager seeded with a ``default`` configuration.
- ``resources/SeedResource.java``: ``POST /seed/create`` writes the
  posted url list to a seed directory and returns its path.
- ``resources/AdminResource.java``: ``GET /admin`` (server info),
  ``GET /admin/stop`` (refused while jobs run unless ``?force=true``,
  like NutchServer.canStop).

Jobs execute the repo's operator CLI (``tools/nutch.py``) in-process —
the same thin-shell layer a terminal user drives, so the REST surface
adds job control without a second code path. Typed args map to the
common tool signatures; ``args.argv`` passes any command verbatim.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

JOB_TYPES = (
    "INJECT", "GENERATE", "FETCH", "PARSE", "UPDATEDB",
    "INDEX", "READDB", "INVERTLINKS", "DEDUP",
)

# JobType -> (command, ordered arg keys) over tools/nutch.py; optional
# keys map to flags. Key names follow the reference's tool arg maps
# (crawldb/url_dir/segment/linkdb).
_JOB_ARGV = {
    "INJECT": ("inject", ["crawldb", "url_dir"]),
    "GENERATE": ("generate", ["crawldb", "segment_dir"]),
    "FETCH": ("fetch", ["fetchlist", "segment_dir"]),
    "PARSE": ("parse", ["segment_dir", "out"]),
    "UPDATEDB": ("updatedb", ["crawldb", "segment_dir"]),
    "INDEX": ("index", ["pages", "out"]),
    "READDB": ("readdb", ["crawldb"]),
    "INVERTLINKS": ("invertlinks", ["linkdb", "outlinks"]),
    "DEDUP": ("dedup", ["crawldb"]),
}


class JobWorker(threading.Thread):
    """impl/JobWorker.java: one thread per job, IDLE -> RUNNING ->
    FINISHED/FAILED; stop/abort flip the state (best-effort, like the
    reference's NutchTool.stopJob/killJob signals)."""

    def __init__(self, job_id: str, config: dict, argv: list[str], runner):
        super().__init__(daemon=True)
        self.info = {
            "id": job_id,
            "type": config.get("type"),
            "confId": config.get("confId", "default"),
            "crawlId": config.get("crawlId"),
            "args": config.get("args", {}),
            "state": "IDLE",
            "msg": "idle",
            "result": None,
        }
        self._argv = argv
        self._runner = runner
        self._killed = threading.Event()

    def run(self) -> None:
        self.info["state"] = "RUNNING"
        self.info["msg"] = "OK"
        try:
            rc = self._runner(self._argv)
            if self._killed.is_set():
                self.info["state"] = "KILLED"
            else:
                self.info["state"] = "FINISHED" if rc == 0 else "FAILED"
                self.info["result"] = rc
        except Exception as exc:  # JobWorker.run catches Exception
            self.info["state"] = "FAILED"
            self.info["msg"] = f"ERROR: {exc}"

    def signal(self, state: str) -> bool:
        if self.info["state"] in ("FINISHED", "FAILED", "KILLED"):
            return False
        self._killed.set()
        self.info["state"] = state
        return True


class NutchServerState:
    """ConfManager + JobManager + SeedManager state, shared across
    handler threads."""

    def __init__(self, seed_root: str | None = None, runner=None):
        if runner is None:
            import nutch as nutch_cli  # tools/nutch.py

            runner = nutch_cli.main
        self.runner = runner
        self.started_ms = int(time.time() * 1000)
        self.configs: dict[str, dict] = {"default": {}}
        self.jobs: dict[str, JobWorker] = {}
        self.seed_root = Path(seed_root or "/tmp/nutch_seeds")
        self.lock = threading.Lock()
        self._seq = 0

    # --- jobs ---------------------------------------------------------
    def create_job(self, config: dict) -> dict:
        jtype = str(config.get("type", "")).upper()
        if jtype not in JOB_TYPES:
            raise ValueError(f"unsupported job type: {jtype!r}")
        conf_id = config.get("confId", "default")
        if conf_id not in self.configs:
            raise ValueError(f"unknown confId: {conf_id!r}")
        args = config.get("args") or {}
        if "argv" in args:
            argv = [str(a) for a in args["argv"]]
        else:
            cmd, keys = _JOB_ARGV[jtype]
            missing = [k for k in keys if k not in args]
            if missing:
                raise ValueError(f"{jtype} args missing {missing}")
            argv = [cmd] + [str(args[k]) for k in keys]
            for flag, val in (args.get("flags") or {}).items():
                argv += [f"--{flag}", str(val)]
        with self.lock:
            self._seq += 1
            parts = [config.get("crawlId"), conf_id, jtype, str(self._seq)]
            job_id = "-".join(p for p in parts if p)
            worker = JobWorker(job_id, {**config, "type": jtype}, argv, self.runner)
            self.jobs[job_id] = worker
        worker.start()
        return worker.info

    def running(self) -> int:
        return sum(1 for w in self.jobs.values() if w.info["state"] == "RUNNING")

    # --- seeds --------------------------------------------------------
    def create_seed(self, body: dict) -> str:
        name = body.get("name") or f"seed-{int(time.time() * 1000)}"
        urls = [
            u["url"] if isinstance(u, dict) else str(u)
            for u in body.get("seedUrls", [])
        ]
        seed_dir = self.seed_root / name
        seed_dir.mkdir(parents=True, exist_ok=True)
        (seed_dir / "urls").write_text("".join(f"{u}\n" for u in urls))
        return str(seed_dir)


def make_handler(state: NutchServerState, server_holder: dict):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code: int = 200) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self) -> None:  # noqa: N802
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            q = parse_qs(u.query)
            if parts == ["admin"]:
                return self._json(
                    {
                        "startDate": state.started_ms,
                        "configuration": sorted(state.configs),
                        "jobs": [w.info for w in state.jobs.values()],
                        "runningJobs": state.running(),
                    }
                )
            if parts == ["admin", "stop"]:
                force = q.get("force", ["false"])[0].lower() == "true"
                if state.running() and not force:
                    return self._json("Can't stop server: jobs running", 409)
                threading.Thread(
                    target=server_holder["server"].shutdown, daemon=True
                ).start()
                return self._json("Stopping in server!")
            if parts == ["config"]:
                return self._json(sorted(state.configs))
            if len(parts) == 2 and parts[0] == "config":
                return self._json(state.configs.get(parts[1]))
            if len(parts) == 3 and parts[0] == "config":
                conf = state.configs.get(parts[1]) or {}
                return self._json(conf.get(parts[2]))
            if parts == ["job"]:
                crawl = q.get("crawlId", [None])[0]
                jobs = [
                    w.info
                    for w in state.jobs.values()
                    if crawl is None or w.info["crawlId"] == crawl
                ]
                return self._json(jobs)
            if len(parts) >= 2 and parts[0] == "job":
                worker = state.jobs.get(parts[1])
                if worker is None:
                    return self._json(f"job not found: {parts[1]}", 404)
                if len(parts) == 2:
                    return self._json(worker.info)
                if parts[2] == "stop":
                    return self._json(worker.signal("STOPPING"))
                if parts[2] == "abort":
                    return self._json(worker.signal("KILLED"))
            return self._json(f"no such resource: {u.path}", 404)

        def do_POST(self) -> None:  # noqa: N802
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            try:
                body = self._body()
                if parts == ["job", "create"]:
                    return self._json(state.create_job(body))
                if len(parts) == 2 and parts[0] == "config":
                    state.configs[parts[1]] = {
                        str(k): str(v) for k, v in body.items()
                    }
                    return self._json(parts[1])
                if parts == ["seed", "create"]:
                    return self._json(state.create_seed(body))
            except ValueError as exc:
                return self._json(str(exc), 400)
            return self._json(f"no such resource: {u.path}", 404)

        def do_DELETE(self) -> None:  # noqa: N802
            parts = [p for p in urlparse(self.path).path.split("/") if p]
            if len(parts) == 2 and parts[0] == "config":
                if parts[1] == "default":
                    return self._json("cannot delete default config", 400)
                state.configs.pop(parts[1], None)
                return self._json(True)
            return self._json("no such resource", 404)

    return Handler


def make_server(
    port: int = 8081, seed_root: str | None = None, runner=None
) -> ThreadingHTTPServer:
    state = NutchServerState(seed_root=seed_root, runner=runner)
    holder: dict = {}
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(state, holder))
    holder["server"] = server
    server.nutch_state = state  # for tests/introspection
    return server


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description="Nutch-equivalent REST job server")
    ap.add_argument("--port", type=int, default=8081)  # NutchServer default
    ap.add_argument("--seed-root", default=None)
    args = ap.parse_args()
    server = make_server(port=args.port, seed_root=args.seed_root)
    print(f"NutchServer listening on 127.0.0.1:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    sys.exit(main())
