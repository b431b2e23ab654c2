from sparkprep.plans.pipeline import Pipeline, Step, explain_formatted  # noqa: F401
