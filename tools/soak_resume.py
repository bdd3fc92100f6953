#!/usr/bin/env python
"""Production-scale crash-resume soak: align the 50M-pair WGS panel with
periodic checkpointing; the driver (or a signal) may kill the process at
any point, and a relaunch with the same arguments must resume from the
checkpoint and finish with counts byte-identical to an uninterrupted
run.  Usage: soak_resume.py <reads.fa> <pan_prefix> <ckpt.npz> <out.ar>
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

    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      okam=False)
    al = DeviceAlignRunner(RPGG(pan), cfg, batch_pairs=4096,
                           max_read_len=160)
    done = al._load_checkpoint(ckpt)[0] if os.path.exists(ckpt) else 0
    print(f"# resume cursor={done}", flush=True)
    al.run_file_native(reads, checkpoint=ckpt,
                       checkpoint_every=2_000_000, prefilter=True)
    al.write_trkmc_ar(out)
    print(f"# done -> {out}", flush=True)


if __name__ == "__main__":
    main()
