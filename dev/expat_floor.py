#!/usr/bin/env python3
"""Single-thread stdlib-expat parse floor for the reference comparison.

The reference (XMLToCSV.py) is CPython + lxml.etree.iterparse with
dtd_validation=True and attribute_defaults=True, run TWICE (schema
pass + data pass), plus per-record dict/CSV work. lxml is not
installable in this offline environment (pip: "No matching
distribution found"), so this measures the cheapest conceivable lower
bound on its wall time instead: ONE bare expat pass (xml.sax, C expat,
no DTD validation, no attribute defaulting, no per-record Python work
beyond an event counter), with external general entities enabled so
the DOCTYPE's dblp.dtd entity definitions resolve, exactly as the
corpus requires. The reference must cost strictly more than 2x this
number (two validated passes + real work per event).

Usage: python3 dev/expat_floor.py /path/to/dblp.xml
"""
import sys, time
import xml.sax


class Counter(xml.sax.handler.ContentHandler):
    def __init__(self):
        self.starts = 0
        self.chars = 0

    def startElement(self, name, attrs):
        self.starts += 1
        # touch attrs the way any consumer must
        if attrs.getLength():
            _ = attrs.getNames()

    def characters(self, content):
        self.chars += len(content)


def main():
    path = sys.argv[1]
    h = Counter()
    parser = xml.sax.make_parser()
    parser.setContentHandler(h)
    # resolve the external DTD subset so &uuml; etc. are defined
    parser.setFeature(xml.sax.handler.feature_external_ges, True)
    t0 = time.time()
    parser.parse(path)
    dt = time.time() - t0
    import os
    mb = os.path.getsize(path) / 1e6
    print(f"RESULT expat_floor: {dt:.1f}s for {mb:.1f} MB "
          f"({mb/dt:.1f} MB/s, {h.starts} start-elements, single thread)")


if __name__ == "__main__":
    main()
