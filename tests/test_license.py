"""License detection (ops/license.py): SPDX precedence, header
fingerprints, rule ordering (GPL version, BSD-3 vs BSD-2), families."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.license import FAMILY, HEADER_RULES, license_detect

pytestmark = pytest.mark.spark

MIT_HDR = (
    "Permission is hereby granted, free of charge, to any person "
    "obtaining a copy of this software"
)
BSD_PRE = "Redistribution and use in source and binary forms"


@pytest.fixture(scope="module")
def files(spark):
    rows = [
        Row(doc_id=1, content="// SPDX-License-Identifier: Apache-2.0\n"
                              "def f(): pass\n"),
        # SPDX tag beats a conflicting header phrase
        Row(doc_id=2, content=f"// SPDX-License-Identifier: GPL-3.0\n"
                              f"/* {MIT_HDR} */\ncode\n"),
        Row(doc_id=3, content=f"/* {MIT_HDR} */\ncode\n"),
        Row(doc_id=4, content="Licensed under the Apache License, "
                              "Version 2.0 (the \"License\")\ncode\n"),
        Row(doc_id=5, content="This program is free software under the "
                              "GNU General Public License, version 3.\n"),
        Row(doc_id=6, content="Distributed under the GNU General Public "
                              "License, version 2.\n"),
        Row(doc_id=7, content=f"/* {BSD_PRE} is permitted provided that "
                              f"neither the name of X nor Y */\n"),
        Row(doc_id=8, content=f"/* {BSD_PRE} is permitted. */\n"),
        Row(doc_id=9, content="plain file with no license at all\n"),
        Row(doc_id=10, content="This is free and unencumbered software "
                               "released into the public domain.\n"),
        # phrase buried past head_chars is not seen
        Row(doc_id=11, content=("x" * 3000) + MIT_HDR),
        Row(doc_id=12, content="under the GNU Affero General Public "
                               "License v3\n"),
    ]
    return spark.createDataFrame(rows)


def test_detection_table(spark, files):
    got = {r["doc_id"]: r for r in license_detect(files).collect()}
    assert (got[1]["license_id"], got[1]["via"]) == ("Apache-2.0", "spdx")
    assert got[1]["family"] == "permissive"
    # SPDX wins over header text
    assert (got[2]["license_id"], got[2]["via"]) == ("GPL-3.0", "spdx")
    assert got[2]["family"] == "copyleft"
    assert (got[3]["license_id"], got[3]["via"]) == ("MIT", "header")
    assert got[4]["license_id"] == "Apache-2.0"
    assert got[5]["license_id"] == "GPL-3.0"
    assert got[6]["license_id"] == "GPL-2.0"
    # BSD-3's neither-the-name clause beats the shared BSD preamble
    assert got[7]["license_id"] == "BSD-3-Clause"
    assert got[8]["license_id"] == "BSD-2-Clause"
    assert (got[9]["license_id"], got[9]["family"], got[9]["via"]) == (
        "", "unknown", "none",
    )
    assert got[10]["license_id"] == "Unlicense"
    assert got[11]["via"] == "none"
    assert got[12]["license_id"] == "AGPL-3.0"
    assert got[12]["family"] == "copyleft"


def test_families_cover_all_rule_ids():
    for lic, _ in HEADER_RULES:
        assert lic in FAMILY, f"{lic} missing a family mapping"
    assert set(FAMILY.values()) == {
        "permissive", "weak-copyleft", "copyleft",
    }


def test_head_chars_validation(spark, files):
    with pytest.raises(ValueError):
        license_detect(files, head_chars=0)
