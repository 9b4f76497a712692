ALTER TABLE users ADD COLUMN display_name text GENERATED ALWAYS AS (coalesce(nickname, full_name)) STORED;
