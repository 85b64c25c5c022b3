"""Fault tolerance of the scale-path stage shape: stateless tasks with
per-worker cached broadcast state (the dedup plan's scorer/emit construction).

A SIGKILLed worker's task is retried on another worker, which lazily rebuilds
the broadcast-derived state — output must be complete and identical. (Ray Data
2.49's ACTOR-pool restart, by contrast, crash-loops after a SIGKILL — observed
`src_fn_name` AttributeError restart storm, ray#53727 territory — which is why
the engine's scale path deliberately uses tasks + worker-cached state instead
of actor pools; see stages/matching.py::_WORKER_STATE.)"""

import os
import signal
import subprocess
import threading
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from registry_address_matcher_ray.stages.matching import (
    _worker_state,
    put_broadcast,
    resolve_broadcast,
)


def test_task_worker_killed_mid_run_output_identical(ray_session):
    ref = put_broadcast(pa.table({"v": list(range(1000))}))
    expected_sum = sum(range(1000))
    key = ("fault-test", ref.ref.hex())

    def stage(batch: pa.Table) -> pa.Table:
        tbl = _worker_state(key, lambda: resolve_broadcast(ref))
        time.sleep(0.3)
        s = int(pc.sum(tbl.column("v")).as_py())
        return batch.append_column("s", pa.array([s] * batch.num_rows, pa.int64()))

    killed = {"pid": None}

    def killer():
        deadline = time.time() + 8
        while time.time() < deadline and killed["pid"] is None:
            time.sleep(1.2)
            try:
                out = subprocess.run(
                    ["ps", "-eo", "pid,cmd"], capture_output=True, text=True
                ).stdout
                for line in out.splitlines():
                    if "ray::MapBatches(stage)" in line:
                        pid = int(line.strip().split()[0])
                        killed["pid"] = pid
                        os.kill(pid, signal.SIGKILL)
                        return
            except Exception:
                pass

    th = threading.Thread(target=killer, daemon=True)
    th.start()
    out = (
        ray.data.range(36, override_num_blocks=18)
        .map_batches(stage, batch_size=2, batch_format="pyarrow")
        .to_pandas()
    )
    th.join(timeout=12)
    assert killed["pid"] is not None, "killer never found a running stage worker"
    assert len(out) == 36
    assert (out["s"] == expected_sum).all()
    assert sorted(out["id"]) == list(range(36))
