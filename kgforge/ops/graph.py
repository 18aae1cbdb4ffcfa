"""graph ops — filled in by later milestones."""
