"""The `ray job submit` entrypoint: runs in a fresh process (the job
driver owns its own Ray session), emits one JSON metrics line, and a
re-submission of the same job resumes from the manifest (all finished
partitions skipped)."""

import json
import os
import subprocess
import sys


def _submit(out_dir: str) -> dict:
    env = dict(os.environ, RAY_ADDRESS="local")
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "europarl_crawler_ray.job_entry",
            "--pipeline",
            "cc_ingest",
            "--out",
            out_dir,
            "--n-urls",
            "4000",
            "--n-partitions",
            "2",
            "--num-cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_job_entry_runs_and_resumes(tmp_path):
    out = str(tmp_path / "run")
    first = _submit(out)
    assert first["stats"]["partitions_done"] == 2
    assert first["stats"]["pages"] > 0
    second = _submit(out)
    assert second["stats"]["partitions_skipped_on_resume"] == 2
    assert second["stats"]["pages"] == 0  # nothing re-ingested
    assert second["stats"]["unique_urls"] == first["stats"]["unique_urls"]
