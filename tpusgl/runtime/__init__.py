"""Host-side runtime: scheduler, pools, radix cache, engine."""
