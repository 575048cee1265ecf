"""Persistent TPU worker: executes queued python jobs in one process.

The axon relay grants the TPU to one process at a time and takes minutes to
re-grant after a client exits, so iterating via fresh `python` invocations
wastes wall-clock. This worker holds the grant and runs job files:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_worker.py &
    # submit: write <name>.py into /tmp/tpu_jobs/; result lands in
    #         /tmp/tpu_jobs/<name>.done (stdout+traceback)
    # stop:   touch /tmp/tpu_jobs/STOP

Jobs share the worker's module state (jit caches persist between jobs —
that's the point). Each job's printed output is captured to its .done file.
"""
import io
import os
import sys
import time
import traceback

QUEUE = "/tmp/tpu_jobs"


def main():
    os.makedirs(QUEUE, exist_ok=True)
    print(f"[tpu_worker] pid={os.getpid()} watching {QUEUE}", flush=True)
    # touch the TPU once so the grant is held and warm
    import jax
    import jax.numpy as jnp
    print(f"[tpu_worker] devices: {jax.devices()}", flush=True)
    _ = float(jnp.zeros(()).sum())
    print("[tpu_worker] ready", flush=True)
    shared = {"__name__": "__tpu_job__"}
    while True:
        if os.path.exists(os.path.join(QUEUE, "STOP")):
            print("[tpu_worker] stopping", flush=True)
            return
        jobs = sorted(f for f in os.listdir(QUEUE)
                      if f.endswith(".py") and not os.path.exists(
                          os.path.join(QUEUE, f + ".done")))
        for j in jobs:
            path = os.path.join(QUEUE, j)
            print(f"[tpu_worker] running {j}", flush=True)
            buf = io.StringIO()
            old = sys.stdout
            t0 = time.time()
            try:
                sys.stdout = buf
                code = compile(open(path).read(), path, "exec")
                exec(code, shared)
                status = "OK"
            except Exception:
                traceback.print_exc(file=buf)
                status = "FAIL"
            finally:
                sys.stdout = old
            out = buf.getvalue()
            with open(path + ".done", "w") as f:
                f.write(f"# status: {status} ({time.time()-t0:.1f}s)\n")
                f.write(out)
            print(f"[tpu_worker] {j}: {status} ({time.time()-t0:.1f}s)",
                  flush=True)
        time.sleep(2)


if __name__ == "__main__":
    main()
