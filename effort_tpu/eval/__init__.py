from effort_tpu.eval.harness import (  # noqa: F401
    effort_scale, cossim, matrix_quality_sweep, agreement_sweep, run_quiz)
