"""Bridge to the MPEG pc_error binary — the distortion ground-truth oracle.

Same CLI contract and stdout scraping as the reference
(/root/reference/pc_error.py:27-74).  The binary is located via the
PCGC_PC_ERROR env var, PATH, or the read-only reference checkout.  When it is
unavailable, callers should fall back to the native implementation in
eval/metrics.py (same result keys).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Dict, Optional

_HEADERS = [
    "mse1      (p2point)", "mse1,PSNR (p2point)",
    "h.       1(p2point)", "h.,PSNR  1(p2point)",
    "mse2      (p2point)", "mse2,PSNR (p2point)",
    "h.       2(p2point)", "h.,PSNR  2(p2point)",
    "mseF      (p2point)", "mseF,PSNR (p2point)",
    "h.        (p2point)", "h.,PSNR   (p2point)",
    "mse1      (p2plane)", "mse1,PSNR (p2plane)",
    "mse2      (p2plane)", "mse2,PSNR (p2plane)",
    "mseF      (p2plane)", "mseF,PSNR (p2plane)",
]


def find_pc_error() -> Optional[str]:
    path = os.environ.get("PCGC_PC_ERROR")
    if path and os.path.exists(path):
        return path
    which = shutil.which("pc_error_d") or shutil.which("pc_error")
    if which:
        return which
    ref = "/root/reference/pc_error_d"
    if os.path.exists(ref):
        if os.access(ref, os.X_OK):
            return ref
        # read-only checkouts ship the ELF without the exec bit: stage an
        # executable copy once, in a per-user dir via atomic rename (a fixed
        # world-writable /tmp path could be pre-planted by another local
        # user, and concurrent runs could exec a half-copied file)
        cachedir = os.path.join(
            os.path.expanduser("~"), ".cache", "pcgcv2_tpu"
        )
        os.makedirs(cachedir, exist_ok=True)
        staged = os.path.join(cachedir, "pc_error_d")
        if not os.path.exists(staged):
            import tempfile

            fd, tmp = tempfile.mkstemp(dir=cachedir)
            with os.fdopen(fd, "wb") as out, open(ref, "rb") as src:
                shutil.copyfileobj(src, out)
            os.chmod(tmp, 0o755)
            os.replace(tmp, staged)
        return staged
    return None


def pc_error(
    infile1: str,
    infile2: str,
    res: int,
    normal: bool = False,
    show: bool = False,
) -> Dict[str, float]:
    """Run pc_error and scrape the metric lines (ref pc_error.py:55-74)."""
    binary = find_pc_error()
    if binary is None:
        raise FileNotFoundError("pc_error binary not found (set PCGC_PC_ERROR)")
    cmd = [
        binary, "-a", infile1, "-b", infile2,
        "--hausdorff=1", f"--resolution={res - 1}",
    ]
    if normal:
        cmd += ["-n", infile1]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    results: Dict[str, float] = {}
    for line in proc.stdout.splitlines():
        if show:
            print(line)
        for key in _HEADERS:
            if key in line:
                # value is the first numeric token AFTER the header (the
                # reference anchors on the token position, pc_error.py:66-69;
                # taking the last float mis-parses lines with several
                # numerics, e.g. scientific-notation pairs)
                tail = line.split(key, 1)[1]
                for tok in tail.replace(":", " ").split():
                    try:
                        results[key] = float(tok)
                        break
                    except ValueError:
                        continue
                break
    return results
