"""SVM models for rare-variant calling.

The reference ships only pretrained pickles (release assets) consumed by
danbing.call.py; here we also provide the training side so the models can
be rebuilt from labeled snarl features (simulation truth via align -s 2).
Feature schemas match analysis/rarevariant.py:

  bubble-root : c_root c_nv_e c_ex_e c_tm_e r_nve_r r_nve_exe n_snrl
                n_tm_e n_bb_e h1 h2 h3
  bubble-path : bbs mcov scov fcmax cdiff n3gp n4gp bdir
"""

from __future__ import annotations

import pickle


def train_svm(X, y, **kwargs):
    from sklearn import svm

    clf = svm.SVC(**kwargs)
    clf.fit(X, y)
    return clf


def save_model(clf, path: str):
    with open(path, "wb") as f:
        pickle.dump(clf, f)


def constant_model(value: bool = True):
    """Always-predict classifier (testing / filter bypass)."""
    from sklearn.dummy import DummyClassifier

    clf = DummyClassifier(strategy="constant", constant=value)
    clf.fit([[0] * 12, [1] * 12], [value, value])
    return clf
