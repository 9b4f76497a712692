CREATE INDEX li_shipdate_idx ON lineitem (l_shipdate);
