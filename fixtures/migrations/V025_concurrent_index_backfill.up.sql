CREATE INDEX CONCURRENTLY idx_users_flags ON users (flags);
UPDATE users SET flags = 0 WHERE flags IS NULL;
