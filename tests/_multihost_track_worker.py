"""Worker for tests/test_multihost.py::test_two_process_fused_tracking:
one of N processes running FUSED TRACKING (vo_scan) with the dp stream
axis spanning processes — the steady-state multi-host claim of
parallel/multihost.py exercised end to end:

- a global (dp, sp=1) mesh over 2 processes x 2 virtual CPU devices,
  2 camera streams per process (one per device);
- every stream tracks its OWN divergent state/image stack via
  parallel.streams.multistream_scan;
- per-stream parity against single-process vo_scan runs;
- DCN-SILENCE PROOF: the compiled HLO of the tracking program must
  contain no collective whose replica group crosses the process
  boundary (and is expected to contain none at all); the count is
  printed as the tracking program's collective budget.

argv: <coordinator> <num_processes> <process_id>
Prints "MULTIHOST_TRACK_OK" on success; "MULTIHOST_UNSUPPORTED: <why>"
if the runtime cannot do multi-process CPU collectives in this build.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=2"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B_LOCAL = 2          # streams (devices) per process
T_SCAN = 6           # frames tracked per stream in the one scan program


def check_collectives(hlo: str, mesh) -> tuple:
    """Return (n_collectives, n_cross_process) from a compiled HLO text.

    Logical device i in replica_groups corresponds to
    mesh.devices.flat[i] (the program's device assignment order)."""
    proc_of = [d.process_index for d in mesh.devices.flat]
    coll_re = re.compile(
        r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
        r"collective-permute)[^\n]*")
    n_coll = 0
    n_cross = 0
    for m in coll_re.finditer(hlo):
        line = m.group(0)
        if line.startswith("collective-permute"):
            pairs = re.search(r"source_target_pairs=\{([^}]*)\}", line)
            n_coll += 1
            if pairs:
                ids = [int(x) for x in re.findall(r"\d+", pairs.group(1))]
                srcs, tgts = ids[0::2], ids[1::2]
                if any(proc_of[s] != proc_of[t]
                       for s, t in zip(srcs, tgts)):
                    n_cross += 1
            continue
        n_coll += 1
        g = re.search(r"replica_groups=\{(\{[^=]*?\})\}", line)
        if g:
            for grp in re.findall(r"\{([^{}]*)\}", g.group(1)):
                procs = {proc_of[int(x)]
                         for x in re.findall(r"\d+", grp)}
                if len(procs) > 1:
                    n_cross += 1
        else:
            gi = re.search(r"replica_groups=\[(\d+),(\d+)\]<=\[(\d+)\]",
                           line)
            if gi:  # iota form: rows of iota(N).reshape(G, S) are groups
                G, S, N = (int(gi.group(i)) for i in (1, 2, 3))
                tail = hlo[m.start():m.start() + len(line)]
                ids = np.arange(N)
                if "T(" in tail:   # transposed iota: be conservative
                    n_cross += 1
                else:
                    for row in ids.reshape(G, S):
                        if len({proc_of[int(x)] for x in row}) > 1:
                            n_cross += 1
            elif "replica_groups" in line:
                n_cross += 1       # unparseable: fail safe
    return n_coll, n_cross


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from rpg_svo_tpu.parallel import multihost
    try:
        multihost.init_multihost(coord, n_proc, pid)
    except Exception as e:  # noqa: BLE001
        print(f"MULTIHOST_UNSUPPORTED: init failed: {e}")
        return
    assert jax.process_count() == n_proc

    # one stream per device: (dp = n_proc*B_LOCAL, sp = 1)
    mesh = multihost.global_mesh("dp", "sp", inner_size=1)
    B = n_proc * B_LOCAL

    from rpg_svo_tpu.config import fast_preset
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.core import fused
    from rpg_svo_tpu.parallel.streams import stack_states, multistream_scan
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset

    shape = (120, 160)
    ds = SyntheticDataset(n_frames=8 + B + T_SCAN, shape=shape,
                          trajectory="circle", radius=0.25,
                          revolutions=0.05)
    cfg = fast_preset(grid_size=10, df_update_k=64, max_seeds=512,
                      max_points=2048, max_kfs_pool=8, max_fts=128,
                      quality_min_fts=20, epi_max_steps=32)
    fh = FrameHandler(ds.cam, cfg, img_shape=shape)
    img0, depth0, T0 = ds.frame(0)
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
    # global stream s = the bootstrap advanced through frame 6+s (every
    # process rebuilds all streams deterministically, then contributes
    # only its own rows to the global arrays)
    states_all = []
    for i in range(1, 6 + B):
        fh.add_image(ds.frame(i)[0], timestamp=i / 50)
        if i >= 6:
            states_all.append(fused.state_from_handler(fh))
    assert len(states_all) == B
    imgs_all = [jnp.stack([ds.frame(7 + s + k)[0] for k in range(T_SCAN)])
                for s in range(B)]

    mine = list(range(pid * B_LOCAL, (pid + 1) * B_LOCAL))
    local_states = stack_states([states_all[s] for s in mine])
    local_imgs = jnp.stack([imgs_all[s] for s in mine])

    # host-local rows -> global dp-sharded arrays (the image input
    # boundary of multihost.py: each process feeds only its own cameras)
    g_states = jax.tree.map(
        lambda x: multihost.host_local_rows(mesh, np.asarray(x), ("dp",)),
        local_states)
    g_imgs = multihost.host_local_rows(mesh, np.asarray(local_imgs),
                                       ("dp",))

    jf = jax.jit(lambda s, im: multistream_scan(
        mesh, s, im, ds.cam, cfg, fh.ncx, fh.ncy, fh.img_shape))
    compiled = jf.lower(g_states, g_imgs).compile()
    n_coll, n_cross = check_collectives(compiled.as_text(), mesh)
    # the tracking program's collective budget: dp streams are
    # embarrassingly parallel — nothing should cross dp, hence nothing
    # should cross the process (DCN) boundary
    print(f"TRACKING_COLLECTIVES total={n_coll} cross_process={n_cross}")
    assert n_cross == 0, \
        f"steady-state tracking crossed the DCN boundary ({n_cross})"

    _, outs = jf(g_states, g_imgs)

    # per-stream parity vs the single-process scan (this process's rows)
    got = {}
    for shard in outs.t_wc.addressable_shards:
        row = shard.index[0].start or 0
        got[row] = np.asarray(shard.data)[0]
    assert sorted(got) == mine, (sorted(got), mine)
    for j, s in enumerate(mine):
        _, ref = fused.vo_scan(states_all[s], imgs_all[s], ds.cam, cfg,
                               fh.ncx, fh.ncy, fh.img_shape)
        d = float(np.max(np.abs(got[s] - np.asarray(ref.t_wc))))
        # not bit-identical: the shard_map program fuses differently, and
        # ~1e-7 float differences get amplified by the pipeline's
        # discrete decisions (a strip-scan argmax / matcher gate can flip
        # one feature) over the 6-frame scan; measured ~7e-4 worst-case
        # position spread, far under the scene's mm-scale error budget
        assert d < 2e-3, f"stream {s} diverged from single-process: {d}"
        assert not bool(np.asarray(ref.failed).any()), f"stream {s} failed"
    print("MULTIHOST_TRACK_OK")


if __name__ == "__main__":
    main()
