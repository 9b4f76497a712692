CREATE TABLE legacy_events (id integer PRIMARY KEY, code char(8), happened_at timestamp NOT NULL, recorded_at timestamp without time zone, archived_at timestamptz, note varchar(40));
