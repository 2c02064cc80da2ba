"""From-scratch numpy evaluator for xgboost JSON artifacts (downstream/xgb_json).

The fixtures are hand-built to the xgboost JSON schema (model.schema:
learner/gradient_booster/model/trees with left_children/right_children/
split_indices/split_conditions/default_left, tree_info class routing,
probability-scale base_score for binary:logistic) and the expectations are
hand-computed, so a traversal-rule or link-function slip fails loudly.
"""

import json

import numpy as np
import pytest

from plantcaduceus_tpu.downstream.gbm import HAVE_XGBOOST, GbmClassifier
from plantcaduceus_tpu.downstream.xgb_json import XgbJsonPredictor


def _tree(left, right, feat, cond, default_left):
    n = len(left)
    return {
        "tree_param": {"num_nodes": str(n), "num_feature": "3",
                       "size_leaf_vector": "1"},
        "left_children": left, "right_children": right,
        "parents": [2147483647] * n,
        "split_indices": feat, "split_conditions": cond,
        "default_left": default_left,
        "base_weights": [0.0] * n,
        "loss_changes": [0.0] * n, "sum_hessian": [1.0] * n,
        "split_type": [0] * n, "categories": [],
        "categories_nodes": [], "categories_segments": [],
        "categories_sizes": [],
    }


def _learner(trees, tree_info, objective="binary:logistic",
             base_score="5E-1", num_class="0", num_feature="3"):
    return {"learner": {
        "attributes": {},
        "feature_names": [], "feature_types": [],
        "gradient_booster": {
            "model": {
                "gbtree_model_param": {"num_trees": str(len(trees)),
                                       "num_parallel_tree": "1"},
                "iteration_indptr": list(range(len(trees) + 1)),
                "tree_info": tree_info, "trees": trees,
            },
            "name": "gbtree",
        },
        "learner_model_param": {"base_score": base_score,
                                "num_class": num_class,
                                "num_feature": num_feature,
                                "num_target": "1"},
        "objective": {"name": objective,
                      "reg_loss_param": {"scale_pos_weight": "1"}},
    }, "version": [2, 0, 3]}


# One depth-2 stump pair: root splits on f0 < 0.5 (missing -> left);
# left child splits on f1 < 2.0 (missing -> right). Leaves at nodes 2,3,4.
#           0: f0 < 0.5
#          /           \
#   1: f1 < 2.0        2: leaf +0.8
#    /        \
# 3: -0.4   4: +0.2
TREE_A = _tree(left=[1, 3, -1, -1, -1], right=[2, 4, -1, -1, -1],
               feat=[0, 1, 0, 0, 0], cond=[0.5, 2.0, 0.8, -0.4, 0.2],
               default_left=[1, 0, 0, 0, 0])
# Single stump on f2 < 1.0: left leaf -0.1, right leaf +0.3 (missing->right)
TREE_B = _tree(left=[1, -1, -1], right=[2, -1, -1],
               feat=[2, 0, 0], cond=[1.0, -0.1, 0.3],
               default_left=[0, 0, 0])


def _write(tmp_path, doc, name="model.json"):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return p


def test_binary_logistic_margins_and_probs(tmp_path):
    pred = XgbJsonPredictor.load(
        _write(tmp_path, _learner([TREE_A, TREE_B], [0, 0])))
    X = np.array([
        [0.0, 1.0, 0.0],   # A: left,left -> -0.4 ; B: left -> -0.1
        [0.0, 3.0, 2.0],   # A: left,right -> +0.2; B: right -> +0.3
        [1.0, 0.0, 0.0],   # A: right -> +0.8     ; B: left -> -0.1
    ])
    m = pred.margin(X)[:, 0]
    np.testing.assert_allclose(m, [-0.5, 0.5, 0.7], atol=1e-12)
    p = pred.predict_proba(X)
    np.testing.assert_allclose(p[:, 1], 1 / (1 + np.exp(-m)), atol=1e-12)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_array_equal(pred.predict(X), [0, 1, 1])


def test_missing_values_route_by_default_left(tmp_path):
    pred = XgbJsonPredictor.load(_write(tmp_path, _learner([TREE_A], [0])))
    X = np.array([
        [np.nan, 3.0, 0.0],   # root default_left=1 -> node1; f1=3 -> +0.2
        [0.0, np.nan, 0.0],   # node1 default_left=0 -> right leaf +0.2
        [np.nan, np.nan, 0.0],  # left then right -> +0.2
        [np.nan, 1.0, 0.0],   # left then left -> -0.4
    ])
    np.testing.assert_allclose(pred.margin(X)[:, 0],
                               [0.2, 0.2, 0.2, -0.4], atol=1e-12)


def test_base_score_is_probability_scale_for_logistic(tmp_path):
    # base_score 0.2 -> margin starts at logit(0.2) = log(0.25)
    pred = XgbJsonPredictor.load(
        _write(tmp_path, _learner([TREE_B], [0], base_score="0.2")))
    X = np.array([[0.0, 0.0, 5.0]])  # tree value +0.3
    np.testing.assert_allclose(pred.margin(X)[0, 0],
                               np.log(0.25) + 0.3, atol=1e-12)


def test_multiclass_softprob_tree_info_routing(tmp_path):
    # three classes, one stump each; tree_info assigns class slots
    doc = _learner([TREE_B, TREE_B, TREE_A], [0, 1, 2],
                   objective="multi:softprob", base_score="0.5",
                   num_class="3")
    pred = XgbJsonPredictor.load(_write(tmp_path, doc))
    X = np.array([[1.0, 0.0, 2.0]])  # B:+0.3 (f2>=1), A: right leaf +0.8
    m = pred.margin(X)[0]
    np.testing.assert_allclose(m, [0.8, 0.8, 1.3], atol=1e-12)
    p = pred.predict_proba(X)[0]
    e = np.exp(m - m.max())
    np.testing.assert_allclose(p, e / e.sum(), atol=1e-12)
    assert pred.predict(X)[0] == 2


def test_regression_identity_link(tmp_path):
    doc = _learner([TREE_B], [0], objective="reg:squarederror",
                   base_score="1.5")
    pred = XgbJsonPredictor.load(_write(tmp_path, doc))
    X = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 9.0]])
    np.testing.assert_allclose(pred.predict(X), [1.4, 1.8], atol=1e-12)
    with pytest.raises(NotImplementedError):
        pred.predict_proba(X)


def test_rejects_non_gbtree_and_non_models(tmp_path):
    doc = _learner([TREE_B], [0])
    doc["learner"]["gradient_booster"]["name"] = "gblinear"
    with pytest.raises(NotImplementedError, match="gbtree"):
        XgbJsonPredictor.load(_write(tmp_path, doc))
    p = tmp_path / "notmodel.json"
    p.write_text('{"hello": 1}')
    with pytest.raises(ValueError, match="learner"):
        XgbJsonPredictor.load(p)
    b = tmp_path / "model.ubj"
    b.write_bytes(b"\x00\x01binary")
    with pytest.raises(ValueError, match="UBJSON"):
        XgbJsonPredictor.load(b)


@pytest.mark.skipif(HAVE_XGBOOST, reason="covers the no-wheel fallback")
def test_gbm_load_falls_back_to_numpy_evaluator(tmp_path):
    path = _write(tmp_path, _learner([TREE_A, TREE_B], [0, 0]))
    clf = GbmClassifier.load(path)
    assert clf.backend == "xgb_json"
    X = np.array([[0.0, 1.0, 0.0]])
    p = clf.predict_proba(X)
    np.testing.assert_allclose(p[0, 1], 1 / (1 + np.exp(0.5)), atol=1e-12)
    with pytest.raises(RuntimeError, match="inference-only"):
        clf.fit(X, np.array([0]))
    with pytest.raises(RuntimeError, match="read-only"):
        clf.save(tmp_path / "out.json")


@pytest.mark.skipif(not HAVE_XGBOOST, reason="needs the xgboost wheel")
def test_numpy_evaluator_matches_real_xgboost(tmp_path):
    """When the wheel IS present (not in this image, but e.g. in a user
    deployment), the numpy evaluator must agree with it bit-for-bit on a
    real trained artifact — the strongest possible parity check."""
    import xgboost as xgb

    rng = np.random.default_rng(0)
    X = rng.standard_normal((200, 5))
    y = (X[:, 0] + 0.5 * X[:, 2] > 0).astype(int)
    clf = xgb.XGBClassifier(n_estimators=20, max_depth=3)
    clf.fit(X, y)
    path = tmp_path / "real.json"
    clf.save_model(str(path))
    ours = XgbJsonPredictor.load(path)
    np.testing.assert_allclose(ours.predict_proba(X),
                               clf.predict_proba(X), atol=1e-6)
