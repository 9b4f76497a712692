CREATE TABLE legacy_events (id integer PRIMARY KEY, code char(8), happened_at timestamp, note varchar(40));
