"""Persistent TPU worker: executes python snippets from a file queue.

Keeps one process (and its jit caches) alive across many experiments so
remote-compile results are reused.  Usage:

    python tools/tpu_worker.py &          # start once
    cat snippet.py > /tmp/tpu_jobs/job_001.py
    # result appears at /tmp/tpu_jobs/job_001.out (stdout+stderr+timing)

Globals persist across jobs in the module dict G.
"""

import io
import contextlib
import glob
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

G: dict = {}


def main():
    print(f"tpu_worker ready, watching {JOBS}", flush=True)
    while True:
        jobs = sorted(glob.glob(os.path.join(JOBS, "job_*.py")))
        for job in jobs:
            out_path = job[:-3] + ".out"
            done_path = job[:-3] + ".done"
            claim_path = job[:-3] + ".claim"
            if os.path.exists(done_path):
                continue
            # atomic claim so two workers never fight over the TPU tunnel
            try:
                fd = os.open(claim_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
            except FileExistsError:
                continue
            with open(job) as f:
                code = f.read()
            buf = io.StringIO()
            t0 = time.time()
            try:
                with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                    exec(compile(code, job, "exec"), G)
                status = "OK"
            except SystemExit:
                status = "OK"
            except Exception:
                buf.write(traceback.format_exc())
                status = "ERROR"
            dt = time.time() - t0
            with open(out_path, "w") as f:
                f.write(buf.getvalue())
                f.write(f"\n[{status} in {dt:.1f}s]\n")
            with open(done_path, "w") as f:
                f.write(status)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
