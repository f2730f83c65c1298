"""Dev harness: diff operators/tsquery.py against the reference's
textsearch1 key XML, query by query. Usage:
    python tools/ts_dev.py [N]      # show first N failing queries
    python tools/ts_dev.py -q 'AND("black","sheep")'
"""
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpcc_platform_spark.operators import tsquery as TQ
from hpcc_platform_spark.regress_fixtures import _ts_index_rows

KEY = "/root/reference/testing/regress/ecl/key/textsearch1.xml"


def parse_key():
    with open(KEY) as f:
        root = ET.fromstring(f"<keys>{f.read()}</keys>")
    ds = root.find("Dataset")
    out = []
    for row in ds.findall("Row"):
        q = row.findtext("query") or ""
        req = []
        reqel = row.find("request")
        for r in reqel.findall("Row"):
            def g(t, el=r):
                return el.findtext(t) or ""
            req.append((
                int(g("stage")), int(g("term")), int(g("action")),
                [[int(x.findtext("stage"))] for x in r.find("inputs").findall("Row")],
                int(g("maxwip")), int(g("maxwipchild")), int(g("maxwipleft")),
                int(g("maxwipright")), g("word"),
                [[x.findtext("word")] for x in r.find("words").findall("Row")],
                int(g("wordflagmask")), int(g("wordflagcompare")),
                int(g("source")), int(g("segment")), int(g("seekwpos")),
                int(g("priority")), int(g("maxdistancerightbeforeleft")),
                int(g("maxdistancerightafterleft")), int(g("minmatches")),
                int(g("maxmatches")),
                [[int(x.findtext("term"))] for x in r.find("termstoprocess").findall("Row")],
            ))
        res = []
        resel = row.find("result")
        for r in resel.findall("Row"):
            def g(t, el=r):
                return el.findtext(t) or ""
            res.append((
                int(g("source")), int(g("subdoc")), int(g("wpos")),
                int(g("wip")), int(g("line")), int(g("column")),
                [
                    [int(x.findtext("wpos")), int(x.findtext("wip")),
                     int(x.findtext("term"))]
                    for x in r.find("words").findall("Row")
                ],
            ))
        out.append((q, req, res))
    return out


def main():
    expected = parse_key()
    idx = _ts_index_rows()
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "-q":
        only = sys.argv[2]
    shown = 0
    limit = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1] != "-q" else 5
    nfail = 0
    fails = []
    for q, ereq, eres in expected:
        if only is not None and q != only:
            continue
        stages = TQ.compile_query(q)
        areq = TQ.request_rows(stages)
        ares = [
            (u[0], u[1], u[2], u[3], u[4], u[5], u[6])
            for u in TQ.user_output(TQ.Executor(idx).run(stages))
        ]
        req_ok = [tuple(r) for r in areq] == [tuple(r) for r in ereq]
        res_ok = [tuple(r) for r in ares] == [tuple(r) for r in eres]
        if req_ok and res_ok:
            continue
        nfail += 1
        fails.append(q)
        if shown < limit or only:
            shown += 1
            print(f"=== FAIL {q!r}  req_ok={req_ok} res_ok={res_ok}")
            if not req_ok:
                for i in range(max(len(areq), len(ereq))):
                    a = areq[i] if i < len(areq) else None
                    e = ereq[i] if i < len(ereq) else None
                    if a != (tuple(e) if e else None):
                        print(f"  req[{i}] got {a}")
                        print(f"  req[{i}] exp {tuple(e) if e else None}")
            if not res_ok:
                for i in range(max(len(ares), len(eres))):
                    a = ares[i] if i < len(ares) else None
                    e = eres[i] if i < len(eres) else None
                    if (a or ()) != tuple(e or ()):
                        print(f"  res[{i}] got {a}")
                        print(f"  res[{i}] exp {tuple(e) if e else None}")
    print(f"\n{nfail} failing of {len(expected)}")
    if fails and not only:
        print("failing queries:", fails[:40])


if __name__ == "__main__":
    main()
