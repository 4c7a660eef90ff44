#!/usr/bin/env python3
"""Extract the reference's Excel dimension tables to parquet fixtures
using only the stdlib (no openpyxl in this container): xlsx is a zip of
XML; values live in xl/worksheets/sheet1.xml with shared strings in
xl/sharedStrings.xml. Data only — no reference code is read or copied.
"""
import re
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def read_xlsx(path: str) -> pd.DataFrame:
    z = zipfile.ZipFile(path)
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall("m:si", NS):
            shared.append("".join(t.text or "" for t in si.iter(
                "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))
    sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in sheet.iter("{http://schemas.openxmlformats.org/spreadsheetml/2006/main}row"):
        cells = {}
        for c in row:
            ref = c.attrib.get("r", "")
            col = re.match(r"([A-Z]+)", ref).group(1)
            v = c.find("m:v", NS)
            if v is None:
                val = None
            elif c.attrib.get("t") == "s":
                val = shared[int(v.text)]
            else:
                val = v.text
            cells[col] = val
        rows.append(cells)
    cols = sorted({c for r in rows for c in r},
                  key=lambda s: (len(s), s))  # A..Z then AA..
    header = [rows[0].get(c) for c in cols]
    data = [[r.get(c) for c in cols] for r in rows[1:]]
    return pd.DataFrame(data, columns=header)


for name in ["master_kategori", "master_driver", "master_kelurahan",
             "master_merchant", "master_user"]:
    df = read_xlsx(f"/root/reference/assets/oltp/{name}.xlsx")
    df = df.astype(str).replace("None", None)
    df.to_parquet(f"src/test/resources/reference/{name}.parquet", index=False)
    print(name, len(df), list(df.columns))
