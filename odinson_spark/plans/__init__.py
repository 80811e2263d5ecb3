"""Driver-side plan construction: prefilter predicates Catalyst can push."""
