"""text ops — filled in by later milestones."""
