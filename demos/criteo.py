"""Criteo dense-feature chain — the reference's flagship demo
(`/root/reference/axolotls/demo/criteo.py:1-52`) re-expressed on the
Spark-backed compat veneer. Same data, same steps:

construct nullable columns → assemble frame → nest a cloned sub-frame
→ fill_null (rebinding) vs fill_null_ (mutating) → (x+3).log() chains
→ recursive broadcast over the nested struct → logit(1/(x+3)).

Where the reference mutates tensors eagerly, the veneer compiles each
step into a lazy Catalyst plan over an immutable DataFrame — clone()
is free (plans are values), and nothing executes until collect/show.
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from axolotls_spark.compat import Frame
from axolotls_spark.session import get_spark


def main() -> None:
    spark = get_spark("demo-criteo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    # ax.NumericColumn(tensor, presence=...) -> nullable ints
    # (criteo.py:4-12); None is the presence mask.
    df = Frame.from_dict(
        spark,
        {
            "dense1": [1382, 2, 2, None, 3],
            "dense2": [None, 0, 0, 893, -1],
            "dense3": [2, 44, 1, None, None],
        },
    )
    print("df"); df.show()

    # df["dense_grp"] = df.clone()  (criteo.py:24-25): clone
    # snapshots the plan, so later mutations of the outer frame do
    # NOT leak into the nested copy — same semantics the reference
    # gets from copying tensors.
    df["dense_grp"] = df.clone()

    # fill_null (rebind) vs fill_null_ (in-place) (criteo.py:30-31);
    # dense3 keeps its nulls, exactly like the reference.
    df["dense1"] = df["dense1"].fill_null(0)
    df.fill_null_(0, cols=["dense2"])
    print("after fill_null"); df.show()

    # (x + 3).log() feature transform (criteo.py:34-35).
    df["dense1"] = (df["dense1"] + 3).log()
    df["dense2"] = (df["dense2"] + 3).log()

    # Nested-frame fill + recursive broadcast (criteo.py:38-39):
    # fill_null_ descends into the struct like
    # struct_column.py:73-85, then (grp + 3).log() broadcasts over
    # its fields like struct_column.py:88-105.
    df.fill_null_(0, cols=["dense_grp"])
    df = df.add(3, cols=["dense_grp"]).log(cols=["dense_grp"])
    print("after log chain"); df.show()

    # logit(1/(x+3)) (criteo.py:51) — the veneer's logit clamps to
    # [eps, 1-eps] like torch's numerically-safe variant.
    df["dense3"] = (1 / (df["dense3"] + 3)).logit()
    print("final"); df.show()


if __name__ == "__main__":
    main()
