"""Deployability: the packaged engine runs via spark-submit --py-files."""

import json
import pathlib
import shutil
import subprocess
import tempfile

import pytest

SPARK_SUBMIT = shutil.which("spark-submit")
REPO_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
CLI_PATH = f"{REPO_ROOT}/deepkg_spark/cli.py"


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files(sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        zip_path = shutil.make_archive(f"{tmp}/deepkg_spark", "zip", REPO_ROOT, "deepkg_spark")
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[2]",
                "--py-files", zip_path,
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=2",
                CLI_PATH,
                "--job", "graph",
                "--sf-dir", sf_dir,
                "--out", f"{tmp}/out",
            ],
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        payload = [l for l in out.stdout.splitlines() if l.startswith('{"job"')]
        assert payload, out.stdout[-2000:]
        res = json.loads(payload[-1])
        assert res["edges"] > 0 and res["nodes"] > 0


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_dedup_and_link_jobs(sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        zip_path = shutil.make_archive(f"{tmp}/deepkg_spark", "zip", REPO_ROOT, "deepkg_spark")

        def run(job, extra=()):
            out = subprocess.run(
                [
                    SPARK_SUBMIT,
                    "--master", "local[2]",
                    "--py-files", zip_path,
                    "--conf", "spark.ui.enabled=false",
                    "--conf", "spark.sql.shuffle.partitions=2",
                    CLI_PATH,
                    "--job", job,
                    "--sf-dir", sf_dir,
                    "--out", f"{tmp}/{job}",
                    *extra,
                ],
                capture_output=True, text=True, timeout=600,
            )
            assert out.returncode == 0, out.stderr[-3000:]
            payload = [l for l in out.stdout.splitlines() if l.startswith('{"job"')]
            return json.loads(payload[-1])

        d = run("dedup", ("--tau", "0.5"))
        assert d["clusters"] > 0
        l = run("link", ("--topn", "3"))
        assert l["candidates"] > 0


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_curate_job(sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        zip_path = shutil.make_archive(f"{tmp}/deepkg_spark", "zip", REPO_ROOT, "deepkg_spark")
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[2]",
                "--py-files", zip_path,
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=2",
                CLI_PATH,
                "--job", "curate",
                "--sf-dir", sf_dir,
                "--out", f"{tmp}/curate",
                "--budget", "256",
                "--shard-size", "100",
            ],
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        payload = [l for l in out.stdout.splitlines() if l.startswith('{"job"')]
        res = json.loads(payload[-1])
        # the funnel only ever narrows, and every stage survives non-empty
        assert (
            res["input"] >= res["after_quality"] >= res["after_dedup"]
            >= res["after_decontaminate"] >= res["after_sample"] > 0
        )
        assert 0 < res["bins"] <= res["after_sample"]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_profile_job(sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        zip_path = shutil.make_archive(f"{tmp}/deepkg_spark", "zip", REPO_ROOT, "deepkg_spark")
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[2]",
                "--py-files", zip_path,
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=2",
                CLI_PATH,
                "--job", "profile",
                "--sf-dir", sf_dir,
                "--out", f"{tmp}/out",
            ],
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        payload = [l for l in out.stdout.splitlines() if l.startswith('{"job"')]
        res = json.loads(payload[-1])
        assert res["columns"] == 11 and res["num_cols"] == 8
        import duckdb

        q = duckdb.connect().execute(
            f"SELECT count(*) FROM '{tmp}/out/quantiles/*.parquet'"
        ).fetchone()[0]
        assert q == 8
