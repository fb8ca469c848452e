"""Test-data location, env-overridable so CI (or any fresh checkout)
can point the suite at tables produced by tools/gen_testdata.py
instead of the canonical /root/testdata."""

import os

ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def sf_dir(scale: str) -> str:
    return f"{ROOT}/sf{scale}"
