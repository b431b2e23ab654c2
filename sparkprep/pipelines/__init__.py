from sparkprep.pipelines.loanstats import (  # noqa: F401
    LOAN_WORKING_COLS,
    loanstats_prep_pipeline,
    run_loanstats_job,
)
