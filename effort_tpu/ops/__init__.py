from effort_tpu.ops.layouts import BucketedMatrix  # noqa: F401
from effort_tpu.ops.bucketize import bucketize  # noqa: F401
from effort_tpu.ops.effort import compute_cutoff, row_rank_counts  # noqa: F401
from effort_tpu.ops.bucketmul import bucket_matvec, dense_matvec  # noqa: F401
