"""Evaluation harness (reference: scripts/eval/).

- ``psm``       style-metric quadruplet ranking benchmark (eval_psm.py)
- ``pst``       style-transfer methods x metrics benchmark (eval_pst.py)
- ``cls``       linear-probe + zero-shot style classification (eval_cls.py)
- ``sweep``     metric monotonicity under single-parameter sweeps (eval_sweep.py)
- ``synthetic`` known-target recovery with MRSTFT + style losses (eval_synthetic.py)
- ``case_study`` single-parameter recovery curves (eval_case_study.py)
"""

from st_ito_tpu.eval.metrics import METRICS, load_metric, style_similarity

__all__ = ["METRICS", "load_metric", "style_similarity"]
