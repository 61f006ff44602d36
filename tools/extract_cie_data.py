"""Extract the public CIE 1931 2-deg CMF table and the CIE D65 SPD table from the
reference headers into .npy data files.

These are standard public colorimetric datasets (CIE 1931 color matching functions at
1nm steps 360-830nm; D65 spectral power distribution at 5nm steps 300-830nm) — we
extract the numeric tables only (reference: /root/reference/source/color/cmf.hpp,
/root/reference/source/color/d65.hpp).
"""
import re
import numpy as np
import pathlib

REF = pathlib.Path("/root/reference/source/color")
OUT = pathlib.Path(__file__).resolve().parent.parent / "mcrt_tpu" / "color" / "data"
OUT.mkdir(parents=True, exist_ok=True)

# CMF: lines like "{ 360, { 0.000129900000, 0.000003917000, 0.000606100000 } },"
cmf_rows = []
pat4 = re.compile(r"\{\s*(\d+)\s*,\s*\{\s*([0-9.eE+-]+)\s*,\s*([0-9.eE+-]+)\s*,\s*([0-9.eE+-]+)\s*\}\s*\}")
for m in pat4.finditer((REF / "cmf.hpp").read_text(errors="replace")):
    cmf_rows.append([float(m.group(i)) for i in range(1, 5)])
cmf = np.array(cmf_rows, dtype=np.float64)
assert cmf.shape == (471, 4), cmf.shape
assert cmf[0, 0] == 360 and cmf[-1, 0] == 830
np.save(OUT / "cmf_1931_2deg.npy", cmf)

# D65: lines like "{ 300,   0.0341 },"
d65_rows = []
pat2 = re.compile(r"\{\s*(\d+)\s*,\s*([0-9.eE+-]+)\s*\}")
for m in pat2.finditer((REF / "d65.hpp").read_text(errors="replace")):
    d65_rows.append([float(m.group(1)), float(m.group(2))])
d65 = np.array(d65_rows, dtype=np.float64)
assert d65.shape == (107, 2), d65.shape
assert d65[0, 0] == 300 and d65[-1, 0] == 830
np.save(OUT / "d65.npy", d65)

print("wrote", OUT / "cmf_1931_2deg.npy", cmf.shape)
print("wrote", OUT / "d65.npy", d65.shape)
