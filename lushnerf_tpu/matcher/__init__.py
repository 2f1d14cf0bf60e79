"""Dense image matching for the multi-view consistency (CTE) loss."""

from lushnerf_tpu.matcher.api import MatchTables, Matcher, PrecomputedMatcher, build_match_tables
