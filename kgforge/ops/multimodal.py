"""multimodal ops — filled in by later milestones."""
