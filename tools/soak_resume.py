#!/usr/bin/env python
"""Production-scale crash-resume soak: align a WGS-shaped panel with
periodic checkpointing; the driver (or a signal) may kill the process at
any point, and a relaunch with the same arguments must resume from the
checkpoint and finish with outputs byte-identical to an uninterrupted
run.

Usage: soak_resume.py <reads.fa> <pan_prefix> <ckpt.npz> <out_prefix>
Env:   DTK_SOAK_OKAM_BU=1   okam + -bu mode (writes .kam + .bub.kmdb;
                            exercises the ordered-effect buffer +
                            side-output checkpointing)
       DTK_SOAK_RETRY=4096  retry ladder (comma-separated tiers)
       DTK_SOAK_E=512       primary expansion cap
       DTK_SOAK_EVERY=      fixed checkpoint cadence in pairs
                            (default: auto, <5% overhead)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    reads, pan, ckpt, out = sys.argv[1:5]
    from danbing_tk_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
    from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG
    from danbing_tk_tpu.io.rowsink import RowSink

    okam_bu = bool(os.environ.get("DTK_SOAK_OKAM_BU"))
    retry = [int(x) for x in os.environ.get(
        "DTK_SOAK_RETRY", "").split(",") if x]
    E = int(os.environ.get("DTK_SOAK_E", 512))
    every = os.environ.get("DTK_SOAK_EVERY")
    every = int(every) if every else None

    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      okam=okam_bu, output_bubbles=okam_bu)
    al = DeviceAlignRunner(RPGG(pan), cfg, batch_pairs=4096,
                           max_read_len=160, expand_cap=E,
                           retry_expand=retry)
    resuming = os.path.exists(ckpt)
    if okam_bu:
        # crash-resume keeps the partial .kam; the checkpoint loader
        # truncates it back to the saved high-water mark
        al.kam_rows = RowSink(out + ".kam", append=resuming)
    print(f"# resuming={resuming} okam_bu={okam_bu} retry={retry} E={E}",
          flush=True)
    al.run_file_native(reads, checkpoint=ckpt, checkpoint_every=every,
                       prefilter=True)
    al.write_trkmc_ar(out + ".trkmc.ar")
    if okam_bu:
        al.write_kam(out + ".kam")
        al.write_bubbles(out + ".bub.kmdb")
    print(f"# done -> {out} referee={al.n_referee} "
          f"retried={al.n_retried}", flush=True)


if __name__ == "__main__":
    main()
