"""similarity ops — filled in by later milestones."""
