"""Elo / Bradley-Terry pipeline (SURVEY.md §2.4 A1-A3) + online
function call (U6) + config (C13)."""

import math

from sutro_spark.operators.elo import bradley_terry_elo, elo, pairwise_counts
from sutro_spark.operators.templates import run_function
from sutro_spark.plans.config import load_config, save_config, try_authentication


def test_pairwise_counts_with_ties(spark):
    # ballots: ["A","B|C"] → A beats B, A beats C, B ties C
    df = spark.createDataFrame(
        [(["A", "B|C"],), (["B", "A"],)], "ranking array<string>"
    )
    rows = {
        (r["winner"], r["loser"]): (r["wins"], r["ties"])
        for r in pairwise_counts(df, "ranking").collect()
    }
    assert rows[("A", "B")] == (1, 0)
    assert rows[("A", "C")] == (1, 0)
    assert rows[("B", "A")] == (1, 0)
    assert rows[("B", "C")] == (0, 1)


def test_bradley_terry_two_player_analytic():
    # Without smoothing, two players with w12 wins vs w21 have
    # s1/s2 = w12/w21 → elo gap = 400/ln10 * ln(w12/w21).
    ratings = bradley_terry_elo([("A", "B", 30, 0), ("B", "A", 10, 0)], laplace=0.0)
    by = {r["label"]: r for r in ratings}
    gap = by["A"]["elo"] - by["B"]["elo"]
    assert abs(gap - 400 / math.log(10) * math.log(3.0)) < 1e-3
    assert ratings[0]["label"] == "A"  # sorted by elo desc
    assert by["A"]["wins"] == 30 and by["A"]["losses"] == 10 and by["A"]["matches"] == 40


def test_bradley_terry_drops_unplayed_and_smooths():
    ratings = bradley_terry_elo([("A", "B", 5, 0)], laplace=0.1)
    labels = {r["label"] for r in ratings}
    assert labels == {"A", "B"}
    a = next(r for r in ratings if r["label"] == "A")
    assert a["elo"] > 1500  # winner above center


def test_elo_end_to_end(spark):
    ballots = [(["A", "B", "C"],)] * 6 + [(["B", "A", "C"],)] * 3 + [(["C", "B", "A"],)]
    df = spark.createDataFrame(ballots, "ranking array<string>")
    out = elo(df, "ranking").collect()
    order = [r["label"] for r in out]
    assert order == ["A", "B", "C"]
    assert abs(sum(math.log(r["strength"]) for r in out)) < 1e-6  # geo-mean 1


def test_run_function_online(tmp_path, monkeypatch):
    res = run_function({"q": "hello"}, "stub-echo", traced=True)
    assert res["response"].startswith("ECHO: ")
    assert res["predictions"] == [res["response"]]
    assert len(res["run_id"]) == 32
    assert res["trace"]["latency_s"] >= 0
    # deterministic run id for idempotent retries
    assert run_function({"q": "hello"}, "stub-echo")["run_id"] == res["run_id"]

    monkeypatch.setenv("SUTRO_SPARK_CONFIG", str(tmp_path / "config.json"))
    assert load_config() == {}
    save_config(api_key="k", base_url="")
    assert load_config()["api_key"] == "k"
    assert try_authentication() is True


def test_ratings_markdown_format(spark, capsys):
    from sutro_spark.operators.elo import ratings_markdown

    ratings = spark.createDataFrame(
        [("a", 1520.5, 1.1, 3.0, 1.0, 4.0), ("b", 1479.5, 0.9, 1.0, 3.0, 4.0)],
        "label string, elo double, strength double, wins double, losses double, matches double",
    )
    md = ratings_markdown(ratings)
    lines = md.splitlines()
    assert lines[0].startswith("| ") and "elo" in lines[0]
    assert set(lines[1]) <= {"|", "-"}
    assert any("1520.5" in ln and ln.startswith("| a") for ln in lines)
    assert len(lines) == 4


def test_rank_run_elo_prints_markdown(spark, capsys):
    from sutro_spark.operators.templates import rank

    df = spark.createDataFrame(
        [(1, "alpha text", "beta text")], "id long, x string, y string"
    )
    ratings = rank(df, ["x", "y"], "quality", run_elo=True)
    printed = capsys.readouterr().out
    assert "| elo" in printed.replace("|  elo", "| elo") or "elo" in printed
    assert printed.count("|") > 8  # a real table, not a stray word
    assert {r["label"] for r in ratings.collect()} <= {"x", "y"}
