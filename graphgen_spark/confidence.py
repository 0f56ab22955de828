"""Comprehension-loss (ECE-style) confidence kernels.

Reference-parity with ``graphgen/utils/calculate_confidence.py``:
- ``normalize_yes_no`` (:52-145): fold top-k token probabilities into
  yes/no/uncertain mass via synonym sets (en+zh), normalized.
- ``yes_no_loss_entropy`` (:148-159): mean -log p(correct) over
  statements; uncertain mass counts against the ground truth.

Pure python, called from Arrow-batched judge UDFs.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

YES_SYNONYMS = frozenset(
    "yes yeah yea yep yup yay ya yah sure certainly absolutely definitely "
    "exactly indeed right correct true t 1".split()
) | frozenset(
    ["是", "对", "好的", "行", "可以", "没错", "当然", "确实", "正确", "真", "对的"]
)
NO_SYNONYMS = frozenset(
    "no nope nop nah naw na negative never not false f 0".split()
) | frozenset(
    ["不", "不是", "没有", "错", "不对", "不行", "不能", "否", "假的"]
)


def normalize_yes_no(
    candidates: Sequence[Tuple[str, float]]
) -> Dict[str, float]:
    """Top-k (token, prob) -> normalized {yes, no, uncertain} mass."""
    yes = no = uncertain = 0.0
    for text, prob in candidates:
        t = str(text).lower().strip()
        if t in YES_SYNONYMS:
            yes += prob
        elif t in NO_SYNONYMS:
            no += prob
        else:
            uncertain += prob
    total = yes + no + uncertain
    if total <= 0:
        return {"yes": 0.0, "no": 0.0, "uncertain": 1.0}
    return {
        "yes": yes / total,
        "no": no / total,
        "uncertain": uncertain / total,
    }


def yes_no_loss_entropy(
    candidates_list: List[Sequence[Tuple[str, float]]],
    ground_truth: List[str],
    floor: float = 1e-9,
) -> float:
    """Mean -log p(correct); the uncertain mass implicitly counts
    against the ground truth because it is excluded from p(correct)."""
    losses = []
    for cands, gt in zip(candidates_list, ground_truth):
        dist = normalize_yes_no(cands)
        p = max(dist[gt.lower()], floor)
        losses.append(-math.log(p))
    return sum(losses) / len(losses)
