"""Pipeline plans: stage orchestration over the checkpoint catalog."""
