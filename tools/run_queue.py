"""Spec-driven serialized TPU training-queue runner.

Single replacement for the round-2 ad-hoc runners (run_queue{,2..6}.py).
Jobs come from a JSON spec; each job gets a per-job outcome record
(rc / timeout / infra-flake / retries) appended to results/queue_<spec>.jsonl
plus the human log results/queue_<spec>.log. Infra flakes (wedged device,
TPU FAILED_PRECONDITION, timeouts on a job that made progress) are retried;
algorithmic failures (non-finite metrics) are not — they are recorded and
the queue moves on.

run_training.py writes results/<tag>.txt atomically (renamed from
<tag>.txt.partial only on success), so a failed job can never leave an
empty results file that reads as silent success.

Usage: python tools/run_queue.py tools/jobs_r3.json

Spec format (JSON):
    {"log": "r3", "jobs": [
        {"tag": "hopper_stand_ppo_r3", "timeout_s": 1800, "retries": 1,
         "args": ["--env", "hopper-stand", "--algo", "ppo", ...]},
        ...]}
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..")

HEALTH_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)));"
    "jax.block_until_ready(x); print('HEALTH_OK')"
)

# Substrings in job output that indicate an infrastructure flake (device
# tunnel wedge, backend crash) rather than an algorithmic failure.
INFRA_MARKERS = (
    "FAILED_PRECONDITION",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE",
    "INTERNAL: ",
    "Unable to initialize backend",
)


def classify(rc: int, text: str) -> str:
    """'ok' | 'infra' (retry) | 'failed' (algorithmic; don't retry)."""
    if rc == 0:
        return "ok"
    return "infra" if any(m in text for m in INFRA_MARKERS) else "failed"


class Queue:
    def __init__(self, spec_path):
        with open(spec_path) as f:
            spec = json.load(f)
        self.jobs = spec["jobs"]
        name = spec.get("log", os.path.splitext(os.path.basename(spec_path))[0])
        self.log_path = os.path.join(ROOT, "results", f"queue_{name}.log")
        self.rec_path = os.path.join(ROOT, "results", f"queue_{name}.jsonl")

    def log(self, msg):
        line = f"{time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        with open(self.log_path, "a") as f:
            f.write(line + "\n")

    def record(self, rec):
        with open(self.rec_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def wait_healthy(self, max_wait_s=3600, probe_timeout=300, retry_sleep=180):
        t0 = time.time()
        while time.time() - t0 < max_wait_s:
            try:
                out = subprocess.run(
                    [sys.executable, "-c", HEALTH_SRC], timeout=probe_timeout,
                    capture_output=True, text=True,
                )
                if "HEALTH_OK" in out.stdout:
                    return True
                self.log(f"health probe rc={out.returncode}: {out.stderr[-200:]}")
            except subprocess.TimeoutExpired:
                self.log("health probe timed out (device wedged); retrying")
            time.sleep(retry_sleep)
        return False

    def run_job(self, job):
        """One attempt. Returns an outcome dict."""
        tag, tmo = job["tag"], int(job.get("timeout_s", 1800))
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(HERE, "run_training.py"),
                 "--tag", tag, *job["args"]],
                timeout=tmo, capture_output=True, text=True,
            )
            text = out.stdout + out.stderr
            return {"tag": tag, "name": tag,
                    "outcome": classify(out.returncode, text),
                    "rc": out.returncode,
                    "wall_s": round(time.time() - t0), "tail": text[-500:]}
        except subprocess.TimeoutExpired as e:
            text = ((e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes)
                    else (e.stdout or ""))
            return {"tag": tag, "name": tag, "outcome": "timeout", "rc": None,
                    "wall_s": round(time.time() - t0), "tail": text[-500:]}

    def main(self):
        for job in self.jobs:
            tag = job["tag"]
            path = os.path.join(ROOT, "results", f"{tag}.txt")
            if os.path.exists(path) and "EVAL" in open(path).read():
                self.log(f"{tag}: already complete, skipping")
                continue
            attempts = 1 + int(job.get("retries", 1))
            for attempt in range(1, attempts + 1):
                if not self.wait_healthy():
                    self.log("device never became healthy; aborting queue")
                    return 1
                self.log(f"{tag}: attempt {attempt}/{attempts} "
                         f"(timeout {job.get('timeout_s', 1800)}s)")
                rec = self.run_job(job)
                rec["attempt"] = attempt
                self.record(rec)
                tail = rec["tail"][-300:].replace("\n", " | ")
                self.log(f"{tag}: {rec['outcome']} rc={rec['rc']} "
                         f"wall={rec['wall_s']}s {tail}")
                # Retry infra flakes and timeouts; not algorithmic failures.
                if rec["outcome"] == "ok" or rec["outcome"] == "failed":
                    break
        self.log("queue done")
        return 0


if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    sys.exit(Queue(sys.argv[1]).main())
