"""Correction layer (reference ``src/correct/``).

Two implementations with identical semantics:

* :mod:`br_tpu.correct.reference` — scalar Python oracle, a direct
  re-statement of the reference state machine.  Ground truth for tests and
  golden-file generation.
* :mod:`br_tpu.correct.engine` — the TPU engine: vmapped
  ``lax.while_loop`` state machines over padded read batches with
  precomputed validity/jump tables and an edit-list output representation.
"""

from br_tpu.correct.reference import (  # noqa: F401
    One,
    Two,
    Graph,
    Greedy,
    GapSize,
    build_methods,
    correct_read,
)
