"""App scaffolding: the generated skeleton must be syntactically valid
AND actually run end-to-end (source CSV → EXT → dedupe → LOD) — the
reference's Setup() writes the same file set interactively
(betl/setup/fileSetup.py:90-280)."""

import os
import runpy
import sys

from betl_spark.setup import APP_DIRS, create_app_skeleton


def test_skeleton_files_and_idempotence(tmp_path):
    root = str(tmp_path / "app")
    written = create_app_skeleton(root)
    assert sorted(os.path.basename(p) for p in written) == [
        ".gitignore",
        "app_config.py",
        "dfl_example.py",
        "main.py",
    ]
    for d in APP_DIRS:
        assert os.path.isdir(os.path.join(root, d))
    for p in written:
        if p.endswith(".py"):
            compile(open(p).read(), p, "exec")
    # second run without force touches nothing
    assert create_app_skeleton(root) == []
    # force rewrites
    assert len(create_app_skeleton(root, force=True)) == 4


def test_scaffolded_app_runs_end_to_end(tmp_path, spark, monkeypatch):
    root = str(tmp_path / "app")
    create_app_skeleton(root)
    with open(os.path.join(root, "src_data", "example_table_name.csv"), "w") as f:
        f.write("id,name\n1,alpha\n1,alpha\n2,beta\n")
    monkeypatch.chdir(root)
    monkeypatch.syspath_prepend(root)
    for mod in ("app_config", "dfl_example"):
        sys.modules.pop(mod, None)
    try:
        runpy.run_path(os.path.join(root, "main.py"), run_name="__main__")
    finally:
        for mod in ("app_config", "dfl_example"):
            sys.modules.pop(mod, None)
    staged = spark.read.parquet(os.path.join(root, "tmp_data", "LOD", "dm_example"))
    got = sorted((r["id"], r["name"]) for r in staged.select("id", "name").collect())
    assert got == [("1", "alpha"), ("2", "beta")]  # deduped, all-string
