"""RESULTS.md generator: the committed table must be reproducible from the
stage reports alone (round-2 advisor finding: hand-edits the generator
cannot re-emit get silently lost on regeneration)."""

import json

from dags_vae_search_tpu.experiments import results


def _reports():
    return {
        "andes": {
            "search": {
                "ground_truth_bic": -1000.0,
                "hill_climb": {
                    "best_bic": -1000.8,
                    "converged": True,
                    "evals": 5,
                    "seconds": 1.0,
                },
            }
        },
        "link": {
            "search": {
                "ground_truth_bic": -2000.0,
                "hill_climb": {
                    "best_bic": -2094.0,
                    "converged": False,
                    "evals": 7,
                    "seconds": 2.0,
                },
                "bo": {"best_bic": -2200.0, "evals": 64, "seconds": 3.0},
            }
        },
        "alarm@big": {
            "train": {
                "epochs": 30,
                "final": {
                    "loss_per_graph": 12.5,
                    "kld_per_graph": 300.0,
                    "graphs_per_second": 9000.0,
                },
            }
        },
    }


def test_gap_computed_from_reports_not_hardcoded():
    text = results.render(_reports())
    # +0.08% = (gt - hc)/|gt| for andes; +4.70% for link — computed values.
    assert "+0.08%" in text
    assert "+4.70%" in text
    assert "converged" in text
    assert "budget-limited" in text


def test_variant_runs_render_in_sweep_section_not_main_table():
    text = results.render(_reports())
    main_table = text.split("## Recipe sweeps")[0]
    assert "alarm@big" not in main_table
    sweep = text.split("## Recipe sweeps")[1]
    assert "alarm@big" in sweep
    assert "12.500" in sweep


def test_bo_strategy_appears_in_search_detail():
    text = results.render(_reports())
    assert "bo -2,200.00" in text


def test_render_is_deterministic_and_json_safe():
    a = results.render(_reports())
    b = results.render(json.loads(json.dumps(_reports())))
    assert a == b


def test_takeaways_only_render_from_live_reports():
    """No hardcoded result claims: an experiment absent from the reports
    must not be named in the takeaways (VERDICT r3 weak #2)."""
    text = results.render(_reports())
    takeaways = text.split("## Key takeaways")[1]
    for name in ("sachs", "hepar2", "child", "0.16%"):
        assert name not in takeaways
    # andes/link gaps ARE backed by the fixture reports -> they render
    assert "andes +0.08%" in takeaways
    assert "link +4.70%" in takeaways
    empty = results.render({})
    assert "no live reports" in empty.split("## Key takeaways")[1]
