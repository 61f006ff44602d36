"""Parse an xplane.pb op profile: top self-time HLO ops with source lines.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/opprof.py /tmp/tracedir [N]
"""
import glob
import json
import sys

from xprof.convert import raw_to_tool_data as rtd


def main():
    d = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    files = glob.glob(f"{d}/plugins/profile/*/*.xplane.pb")
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    j = json.loads(data) if isinstance(data, (str, bytes)) else data
    # framework_op_stats returns gviz table json; fall back to op_profile tree
    try:
        rows = j[0]["p"] if isinstance(j, list) else None
    except Exception:
        rows = None
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    t = json.loads(data)
    out = []

    def walk(node, depth=0, path=""):
        m = node.get("metrics", {})
        name = node.get("name", "")
        raw = int(m.get("rawTime", 0))
        kids = node.get("children", [])
        if not kids and raw:
            xla = node.get("xla", {})
            prov = xla.get("provenance", "")
            out.append((raw, name, prov))
        for ch in kids:
            walk(ch, depth + 1, path + "/" + name)

    walk(t.get("byCategory", t.get("byProgram", {})))
    out.sort(reverse=True)
    tot = sum(r for r, _, _ in out)
    print(f"total leaf time: {tot/1e9:.2f} ms (over all reps)")
    for raw, name, prov in out[:n]:
        print(f"{raw/1e9:8.3f}ms {100*raw/tot:5.1f}% {name[:48]:48s} {prov[:90]}")


if __name__ == "__main__":
    main()
