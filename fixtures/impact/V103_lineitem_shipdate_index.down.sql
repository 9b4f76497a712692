DROP INDEX li_shipdate_idx;
