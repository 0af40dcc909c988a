"""Persistent TPU job worker.

The axon TPU grant is exclusive and wedges for ~10 minutes when a holding
process is killed, so all TPU work in this environment runs through ONE
long-lived process. Jobs are python files dropped into the queue directory;
they are exec'd in lexical order inside a shared globals() (so jit caches
and loaded data persist between jobs). For job X.py the worker writes
X.out (stdout+stderr+traceback) and X.done (exit marker).

Usage:
  python scripts/tpu_worker.py /tmp/tpu_jobs &    # start once
  cp myjob.py /tmp/tpu_jobs/010_myjob.py          # enqueue
  cat /tmp/tpu_jobs/010_myjob.done                # poll

A job file named STOP shuts the worker down.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
import traceback


def main(queue_dir: str) -> None:
    # make the repo importable regardless of how the worker was launched
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    os.makedirs(queue_dir, exist_ok=True)
    shared: dict = {}
    print(f"worker ready, queue={queue_dir}", flush=True)
    while True:
        jobs = sorted(
            f for f in os.listdir(queue_dir)
            if f.endswith(".py") and not os.path.exists(
                os.path.join(queue_dir, f + ".done")
            )
        )
        if any(f == "STOP" for f in os.listdir(queue_dir)):
            print("worker stopping", flush=True)
            return
        if not jobs:
            time.sleep(1.0)
            continue
        job = jobs[0]
        path = os.path.join(queue_dir, job)
        t0 = time.time()
        status = "ok"
        # stream output to the .out file as the job runs (line-buffered) so
        # long jobs can be monitored from outside
        with open(path + ".out", "w", buffering=1) as out:
            try:
                with contextlib.redirect_stdout(out), contextlib.redirect_stderr(out):
                    code = compile(open(path).read(), path, "exec")
                    exec(code, shared)
            except SystemExit as e:  # scripts run via runpy may sys.exit()
                if e.code not in (0, None):
                    status = "error"
                    out.write(f"SystemExit({e.code})\n")
            except Exception:
                status = "error"
                out.write(traceback.format_exc())
        with open(path + ".done", "w") as f:
            f.write(f"{status} {time.time()-t0:.1f}s\n")
        print(f"{job}: {status} in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs")
