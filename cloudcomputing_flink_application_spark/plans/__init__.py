"""Plan-shaping and plan-inspection utilities."""
